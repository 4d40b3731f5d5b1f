"""Host->device transfer pipelining: stage the NEXT batch's H2D upload while
the current step computes.

The training loop's per-batch sequence was serial: host decode (overlapped by
the Loader's producer thread) -> ``put_volume`` H2D transfer (BLOCKING the
loop; 2-6 s per 98 MB batch through the axon relay wire, microseconds on a
PCIe host) -> step dispatch. The wire therefore added its full cost to every
step. This wrapper moves global-batch assembly + transfer to a background
thread with a depth-1 queue: while step N computes, batch N+1 is decoding
(producer thread) AND uploading (this thread) — steady-state epoch wall
drops toward max(wire, compute) instead of their sum.

Thread-safety: PJRT allows concurrent host->device transfers while the main
thread dispatches computations; whether a given transport actually overlaps
transfer with compute is measured (scripts/epoch_probe.py records it for
the axon relay). Device memory cost: one extra staged batch.

Reference analog: torch DataLoader workers + pin_memory overlap host decode,
and CUDA's async H2D copies overlap transfer (ref: src/train.py:75-77,
296-299); this is the JAX-native equivalent of both.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class DevicePrefetcher:
    """Wrap a Loader; yield batches already staged on device.

    ``stage(inputs, labels) -> (dev_inputs, dev_labels)`` runs on the
    background thread (global-batch assembly + put_volume). All other
    attributes (len, set_epoch, skip_batches, ...) delegate to the wrapped
    loader. ``depth`` bounds the number of staged batches resident on
    device beyond the one in use.
    """

    def __init__(self, loader, stage: Callable, depth: int = 1):
        self._loader = loader
        self._stage = stage
        self._depth = max(1, int(depth))

    def __getattr__(self, name):
        return getattr(self._loader, name)

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        stop = threading.Event()
        SENTINEL = object()

        def put(item) -> bool:
            # Stop-aware put: a consumer that abandons the iterator
            # (preemption break / exception) sets ``stop`` and drains
            # nothing more; a bare q.put would strand this thread and a
            # staged device batch for the process lifetime.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            src = iter(self._loader)
            try:
                for inputs, labels, n_valid in src:
                    if stop.is_set():
                        break
                    staged = self._stage(inputs, labels)
                    if not put((staged[0], staged[1], n_valid)):
                        break
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                put(e)
            finally:
                put(SENTINEL)
                # Unwind the underlying loader's own producer machinery.
                close = getattr(src, "close", None)
                if close is not None:
                    try:
                        close()
                    except Exception:  # noqa: BLE001
                        pass

        t = threading.Thread(target=worker, daemon=True,
                             name="gaviko-h2d-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so a blocked put() returns promptly.
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10.0)
