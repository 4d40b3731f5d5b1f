"""grain-backed loader: the same deterministic batch stream as ``Loader``,
executed by grain's prefetching dataset runtime.

The north-star design note for this rebuild calls for the reference's torch
DataLoader + torchio workers (ref: src/train.py:65-78) to become a host-side
grain pipeline. ``GrainLoader`` is that engine swap: it reuses ``Loader``'s
epoch/batch/seed logic verbatim (same shuffle permutation per epoch, same
per-sample RNG keyed by GLOBAL dataset index, same pad_to_batch /
ignore_index and multi-host slice semantics), so the yielded
``(inputs, labels, n_valid)`` stream is bit-identical to the threaded
loader's — regression-tested in tests/test_grain_loader.py — while batch
assembly and prefetch run inside grain's deterministic-order dataset
runtime:

    MapDataset.source(epoch batches) -> map(assemble) ->
    to_iter_dataset(ReadOptions(num_threads, prefetch_buffer_size))
    [-> mp_prefetch(MultiprocessingOptions(num_workers))]

Thread mode (default) matches ``Loader``'s threading model and works with
any transform. Process mode (``processes=N``) sidesteps the GIL for
numpy-heavy host augmentation on multi-core hosts, but requires every
transform to be picklable (module-level functions / functools.partial —
true for data/transforms.py; NOT for closures like train.py's raw
device-augment lambdas, which don't need host parallelism anyway).

Select with ``data.loader: grain`` (+ optional ``data.grain_processes``) in
the YAML config; ``pick_loader`` in data/pipeline.py dispatches.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from gaviko_tpu.data.pipeline import Loader, VolumeDataset


class _BatchAssembler:
    """Picklable per-batch assembler; replicates Loader's assemble()."""

    def __init__(self, ds: VolumeDataset, batch_size: int, pad_to_batch: bool,
                 shard: Tuple[int, int], epoch_seed: int):
        self.ds = ds
        self.batch_size = batch_size
        self.pad_to_batch = pad_to_batch
        self.shard = shard
        self.epoch_seed = epoch_seed

    def __call__(self, bidx: np.ndarray):
        pi, pc = self.shard
        if pc > 1:
            per = self.batch_size // pc
            rows = range(pi * per, (pi + 1) * per)
        else:
            rows = range(self.batch_size if self.pad_to_batch else len(bidx))
        idxs = [int(bidx[r]) for r in rows if r < len(bidx)]
        rngs = [
            np.random.RandomState((self.epoch_seed * 1_000_003 + i) % (2**31))
            for i in idxs
        ]
        vols = [self.ds.load(i, rng) for i, rng in zip(idxs, rngs)]
        # GLOBAL real-row count, matching Loader.assemble (see the comment
        # there): metric weighting needs the global denominator under
        # multi-host sharding.
        n_valid = min(len(bidx), self.batch_size)
        n_pad = len(rows) - len(vols)
        if n_pad:
            template = vols[0] if vols else self.ds.load(
                int(bidx[0]), np.random.RandomState(0))
            vols = vols + [np.zeros_like(template)] * n_pad
        inputs = np.stack(vols)
        labels = None
        if self.ds.labels is not None:
            labels = np.asarray(self.ds.labels[idxs], dtype=np.int32)
            if n_pad:
                labels = np.concatenate(
                    [labels, np.full(n_pad, -100, np.int32)])
        return inputs, labels, n_valid


class GrainLoader(Loader):
    """Drop-in for ``Loader`` running on grain's dataset runtime.

    Same constructor plus ``processes``: >0 moves batch assembly into that
    many grain worker PROCESSES (``mp_prefetch``) — transforms must be
    picklable. 0 (default) uses grain's thread prefetch: ``num_workers``
    batches assemble concurrently, ``prefetch`` sets the read buffer.
    """

    def __init__(self, *args, processes: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.processes = processes

    def __iter__(self) -> Iterator[
            Tuple[np.ndarray, Optional[np.ndarray], int]]:
        import grain

        batches = self._batches()
        self._epoch += 1
        epoch_seed = self.seed + self._epoch  # == Loader's producer seed
        assemble = _BatchAssembler(self.ds, self.batch_size,
                                   self.pad_to_batch, self.shard, epoch_seed)
        ds = grain.MapDataset.source(
            [np.asarray(b) for b in batches]).map(assemble)
        if self.processes > 0:
            it = ds.to_iter_dataset().mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.processes))
        else:
            it = ds.to_iter_dataset(grain.ReadOptions(
                num_threads=self.num_workers,
                prefetch_buffer_size=max(self.prefetch, 1)))
        return iter(it)
