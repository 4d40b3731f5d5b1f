"""Host-side data pipeline: npz volumes -> prefetched device batches.

Replaces the reference's torch DataLoader + torchio workers (ref:
src/data/dataset.py, src/train.py:65-78) with a thread-pooled numpy loader
that overlaps disk IO + augmentation with device compute. Contract preserved:
- CSV columns ``mri_path, kl_grade, subset``; subset split train/val/test
- each .npz holds key ``data`` shaped (D, H, W); channel dim prepended
- folder inference scans ``*.npz`` (ref: inference.py:141-158)
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np


@dataclass
class VolumeDataset:
    paths: List[str]
    labels: Optional[np.ndarray]  # None for prediction datasets
    transform: Callable[..., np.ndarray]
    train: bool = False

    def __len__(self) -> int:
        return len(self.paths)

    def load(self, i: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        from gaviko_tpu.data.native_loader import widen_f32

        with np.load(self.paths[i]) as z:
            vol = z["data"]
        # int16/uint16 raw MRI volumes widen via the multithreaded C++ core.
        vol = np.expand_dims(widen_f32(vol), 0)  # (1, D, H, W) float32
        if self.train:
            return self.transform(vol, rng or np.random.RandomState())
        return self.transform(vol)


def split_dataframe(df, subset: str):
    return df[df["subset"] == subset].reset_index(drop=True)


def dataset_from_dataframe(
    df, transform, train: bool, image_folder: Optional[str] = None
) -> VolumeDataset:
    paths = [
        os.path.join(image_folder, p) if image_folder else p
        for p in df["mri_path"].tolist()
    ]
    labels = np.asarray(df["kl_grade"].tolist()) if "kl_grade" in df else None
    return VolumeDataset(paths=paths, labels=labels, transform=transform, train=train)


def scan_folder(image_folder: str):
    """Folder scan -> dataframe-like dict (ref: inference.py:141-158)."""
    import pandas as pd

    paths = [
        os.path.join(image_folder, f)
        for f in os.listdir(image_folder)
        if f.endswith(".npz")
    ]
    return pd.DataFrame({"mri_path": paths})


class Loader:
    """Batched loader with worker threads + background prefetch of the next
    batches. Yields (inputs [B,1,D,H,W] float32, labels [B] int32 | None).

    The final partial batch is yielded as-is (like torch DataLoader
    drop_last=False); callers that need static shapes for jit can pass
    ``pad_to_batch=True`` to zero-pad it (with a valid-count mask returned).

    Multi-host data parallelism: ``shard=(process_index, process_count)``
    makes each host load only its contiguous slice of every global batch
    (rows [pi*B/pc, (pi+1)*B/pc) — matching a P('data') row layout), with
    per-sample augmentation RNG keyed by the GLOBAL dataset index so the
    epoch is deterministic regardless of host count. Requires pad_to_batch
    and batch_size % process_count == 0. ``n_valid`` stays the GLOBAL
    real-row count of the batch (the sharded step computes loss/#correct
    over the assembled global batch, so metric weighting needs the global
    denominator).
    """

    def __init__(
        self,
        ds: VolumeDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 2,
        pad_to_batch: bool = False,
        shard: Tuple[int, int] = (0, 1),
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.pad_to_batch = pad_to_batch
        self.shard = shard
        if shard[1] > 1:
            assert pad_to_batch and batch_size % shard[1] == 0, (
                "multi-host loading requires pad_to_batch=True and "
                "batch_size divisible by process_count"
            )
        self._epoch = 0
        self._skip_next = 0

    def __len__(self) -> int:
        return (len(self.ds) + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle/augmentation RNG epoch (torch's
        ``DistributedSampler.set_epoch`` analog). The training loop calls
        this each epoch so the batch order is a function of the TRUE epoch
        number — a run resumed at epoch E replays exactly the stream the
        uninterrupted run would have seen (without it, a fresh process
        restarts the internal counter at 0)."""
        self._epoch = int(epoch)

    def skip_batches(self, k: int) -> None:
        """Drop the first ``k`` batches of the NEXT epoch only — mid-epoch
        preemption resume: the consumed prefix is never loaded again (skipping
        happens on index lists, before any npz IO). Per-sample augmentation
        RNG is keyed by (epoch_seed, global dataset index), so the surviving
        batches are bit-identical to positions k.. of the full epoch."""
        self._skip_next = int(k)

    def _batches(self) -> List[np.ndarray]:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        out = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self._skip_next:
            out = out[self._skip_next:]
            self._skip_next = 0
        return out

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray], int]]:
        batches = self._batches()
        self._epoch += 1
        pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def assemble(bidx, epoch_seed):
            pi, pc = self.shard
            if pc > 1:
                per = self.batch_size // pc
                rows = range(pi * per, (pi + 1) * per)
            else:
                rows = range(self.batch_size if self.pad_to_batch else len(bidx))
            # Global batch row r is a real sample iff r < len(bidx); real
            # rows of this host's slice come first (contiguous layout).
            idxs = [int(bidx[r]) for r in rows if r < len(bidx)]
            rngs = [
                np.random.RandomState((epoch_seed * 1_000_003 + i) % (2**31))
                for i in idxs
            ]
            vols = list(pool.map(self.ds.load, idxs, rngs))
            # n_valid is the GLOBAL real-row count of this batch, not the
            # host-local slice's: the sharded train step computes loss /
            # #correct over the assembled GLOBAL batch, so the metric
            # weighting in train/loop.py needs the global denominator
            # (host-local counts also differ across hosts — pad rows land
            # on the last host's slice; found by scripts/multihost_dryrun.py:
            # 2-process CSV losses came out exactly halved).
            n_valid = min(len(bidx), self.batch_size)
            n_pad = len(rows) - len(vols)
            if n_pad:
                template = vols[0] if vols else self.ds.load(
                    int(bidx[0]), np.random.RandomState(0)
                )
                vols = vols + [np.zeros_like(template)] * n_pad
            inputs = np.stack(vols)
            labels = None
            if self.ds.labels is not None:
                labels = np.asarray(self.ds.labels[idxs], dtype=np.int32)
                if n_pad:
                    # Padded rows get ignore_index so losses/accuracy skip them.
                    labels = np.concatenate(
                        [labels, np.full(n_pad, -100, np.int32)]
                    )
            return inputs, labels, n_valid

        def put(item) -> bool:
            # Never block forever on a full queue: a consumer that abandons
            # the iterator mid-epoch (break / exception) sets `stop` but
            # drains nothing more, and a plain q.put would strand this thread
            # (plus a prefetched batch of volumes) for the process lifetime.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # An exception here (corrupt/missing .npz) must reach the
            # consumer: swallowing it would end the epoch early and silently
            # skew metrics that divide by the full dataset length.
            epoch_seed = self.seed + self._epoch
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    if not put(assemble(b, epoch_seed)):
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised in __iter__
                put(e)
            else:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        self._last_producer = t  # introspectable by tests (leak regression)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


def pick_loader(config: dict):
    """Loader engine from ``data.loader``: "native" (default, the threaded
    producer above) or "grain" (grain dataset runtime, same stream —
    data/grain_pipeline.py). Returns a callable with Loader's signature;
    for grain, ``data.grain_processes`` > 0 selects process workers."""
    kind = config.get("data", {}).get("loader", "native")
    if kind == "native":
        return Loader
    if kind == "grain":
        import functools

        from gaviko_tpu.data.grain_pipeline import GrainLoader

        procs = int(config.get("data", {}).get("grain_processes", 0))
        return functools.partial(GrainLoader, processes=procs)
    raise ValueError(f"Unknown data.loader: {kind!r} (native | grain)")
