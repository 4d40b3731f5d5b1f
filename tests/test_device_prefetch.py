"""DevicePrefetcher (H2D pipelining) unit contract: ordering, exception
propagation, and clean unwinding when the consumer abandons mid-epoch."""

import threading
import time

import numpy as np
import pytest

from gaviko_tpu.data.device_prefetch import DevicePrefetcher


class _FakeLoader:
    def __init__(self, n=6, fail_at=None, slow_s=0.0):
        self.n = n
        self.fail_at = fail_at
        self.slow_s = slow_s
        self.epoch = 0
        self.closed = False

    def __len__(self):
        return self.n

    def set_epoch(self, e):
        self.epoch = e

    def __iter__(self):
        try:
            for i in range(self.n):
                if self.fail_at is not None and i == self.fail_at:
                    raise RuntimeError(f"corrupt volume at batch {i}")
                if self.slow_s:
                    time.sleep(self.slow_s)
                yield (np.full((2, 3), i, np.float32),
                       np.full((2,), i, np.int32), 2)
        finally:
            self.closed = True


def _stage(inputs, labels):
    # Mirrors the loop's staging signature (assembly + transfer); tag the
    # batch so staged-on-the-worker-thread is observable.
    return inputs + 0.5, labels


def test_prefetcher_preserves_order_and_stages():
    loader = _FakeLoader(n=5)
    pf = DevicePrefetcher(loader, _stage)
    got = list(pf)
    assert len(got) == 5
    for i, (x, y, n_valid) in enumerate(got):
        assert n_valid == 2
        np.testing.assert_array_equal(x, np.full((2, 3), i + 0.5, np.float32))
        np.testing.assert_array_equal(y, np.full((2,), i, np.int32))
    # attribute delegation
    assert len(pf) == 5
    pf.set_epoch(3)
    assert loader.epoch == 3


def test_prefetcher_propagates_loader_errors():
    pf = DevicePrefetcher(_FakeLoader(n=6, fail_at=2), _stage)
    got = []
    with pytest.raises(RuntimeError, match="corrupt volume"):
        for item in pf:
            got.append(item)
    assert len(got) == 2  # batches before the failure arrived in order


def test_prefetcher_abandoned_consumer_unwinds_worker():
    """Breaking out mid-epoch (preemption) must stop the worker thread and
    close the underlying loader iterator, not strand them on a full queue."""
    loader = _FakeLoader(n=50, slow_s=0.01)
    pf = DevicePrefetcher(loader, _stage, depth=1)
    it = iter(pf)
    next(it)
    next(it)
    it.close()  # what GC/for-loop-exit does
    deadline = time.time() + 5.0
    while not loader.closed and time.time() < deadline:
        time.sleep(0.02)
    assert loader.closed, "underlying loader iterator was not closed"
    # No gaviko prefetch threads left running.
    time.sleep(0.1)
    assert not any(t.name == "gaviko-h2d-prefetch" and t.is_alive()
                   for t in threading.enumerate())
