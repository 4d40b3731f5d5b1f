"""Data transforms + loader behaviors."""

import numpy as np
import pytest

from gaviko_tpu.data import transforms as T
from gaviko_tpu.data.pipeline import Loader, VolumeDataset


def test_rescale_bounds_and_range():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 8, 8, 8).astype(np.float32) * 100 - 30
    y = T.rescale_intensity(x)
    assert y.min() == 0.0 and abs(y.max() - 1.0) < 1e-6
    # Order preserved (monotone map).
    flat_x, flat_y = x.ravel(), y.ravel()
    i, j = flat_x.argmin(), flat_x.argmax()
    assert flat_y[i] == 0.0 and abs(flat_y[j] - 1.0) < 1e-6


def test_random_flip_only_d_axis():
    x = np.arange(2 * 4 * 3 * 3, dtype=np.float32).reshape(2, 4, 3, 3)
    rng = np.random.RandomState(0)
    flipped = T.random_flip(x, rng, p=1.0)
    np.testing.assert_array_equal(flipped, x[:, ::-1])


def test_random_affine_identity_statistics():
    """Affine with p=1 preserves gross statistics (rotation <= 15deg, scale
    ~[0.9, 1.1]) — a distributional sanity check, not torchio parity."""
    rng = np.random.RandomState(3)
    x = np.ones((1, 16, 16, 16), np.float32)
    y = T.random_affine(x, rng, p=1.0)
    assert y.shape == x.shape
    # interior stays ~1 (border zero-padding only affects edges)
    assert y[0, 6:10, 6:10, 6:10].mean() > 0.95


def test_intensity_augs_change_data_but_keep_shape():
    rng = np.random.RandomState(4)
    x = rng.rand(1, 8, 8, 8).astype(np.float32)
    noised = T.random_noise(x, np.random.RandomState(1), p=1.0)
    blurred = T.random_blur(x, np.random.RandomState(2), p=1.0)
    assert noised.shape == x.shape and blurred.shape == x.shape
    assert not np.allclose(noised, x)
    assert not np.allclose(blurred, x)


def _mk_ds(tmp_path, n=5, train=False):
    paths = []
    rng = np.random.RandomState(0)
    for i in range(n):
        p = str(tmp_path / f"v{i}.npz")
        np.savez(p, data=rng.rand(6, 8, 8).astype(np.float32))
        paths.append(p)
    labels = np.arange(n) % 3
    tf = T.train_transform if train else T.eval_transform
    return VolumeDataset(paths=paths, labels=labels, transform=tf, train=train)


def test_loader_batching_and_final_partial(tmp_path):
    ds = _mk_ds(tmp_path, n=5)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [2, 2, 1]
    assert [b[2] for b in batches] == [2, 2, 1]
    assert batches[0][0].shape[1:] == (1, 6, 8, 8)


def test_loader_pad_to_batch_marks_ignore(tmp_path):
    ds = _mk_ds(tmp_path, n=5)
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=2,
                    pad_to_batch=True)
    batches = list(loader)
    assert batches[-1][0].shape[0] == 4
    assert batches[-1][2] == 1
    assert (batches[-1][1][1:] == -100).all()


def test_loader_shuffle_is_epoch_deterministic(tmp_path):
    ds = _mk_ds(tmp_path, n=5)
    l1 = Loader(ds, batch_size=5, shuffle=True, num_workers=1, seed=7)
    l2 = Loader(ds, batch_size=5, shuffle=True, num_workers=1, seed=7)
    b1 = next(iter(l1))[1]
    b2 = next(iter(l2))[1]
    np.testing.assert_array_equal(b1, b2)
    # Next epoch reshuffles.
    b1b = next(iter(l1))[1]
    assert not np.array_equal(b1, b1b) or len(b1) <= 2


def test_loader_shard_reconstructs_global_batch(tmp_path):
    """Host shards (pi, pc) concatenate to exactly the unsharded batch —
    the process-index math behind multi-host data parallelism."""
    ds = _mk_ds(tmp_path, n=6)
    full = list(Loader(ds, batch_size=4, shuffle=True, num_workers=1,
                       seed=3, pad_to_batch=True))
    s0 = list(Loader(ds, batch_size=4, shuffle=True, num_workers=1,
                     seed=3, pad_to_batch=True, shard=(0, 2)))
    s1 = list(Loader(ds, batch_size=4, shuffle=True, num_workers=1,
                     seed=3, pad_to_batch=True, shard=(1, 2)))
    assert len(full) == len(s0) == len(s1) == 2
    for f, a, b in zip(full, s0, s1):
        np.testing.assert_array_equal(
            f[0], np.concatenate([a[0], b[0]], axis=0)
        )
        np.testing.assert_array_equal(
            f[1], np.concatenate([a[1], b[1]], axis=0)
        )
        # Every host reports the GLOBAL real-row count: the sharded step
        # computes loss/#correct over the assembled global batch, so the
        # metric denominators must match the single-process run (host-local
        # counts halved every multi-host CSV loss — scripts/multihost_dryrun).
        assert a[2] == b[2] == f[2]
    # Final batch: 2 real rows globally; host 1's slice is all-pad but
    # still reports the global count.
    assert s0[-1][2] == 2 and s1[-1][2] == 2
    assert (s1[-1][1] == -100).all()


def test_loader_shard_requires_padding(tmp_path):
    ds = _mk_ds(tmp_path, n=4)
    with pytest.raises(AssertionError):
        Loader(ds, batch_size=4, shuffle=False, shard=(0, 2))
    with pytest.raises(AssertionError):
        Loader(ds, batch_size=3, shuffle=False, pad_to_batch=True,
               shard=(0, 2))


def test_loader_propagates_producer_errors(tmp_path):
    """A corrupt/missing volume must raise in the consumer, not silently end
    the epoch early (which would quietly skew epoch metrics)."""
    ds = _mk_ds(tmp_path, n=4)
    ds.paths[2] = str(tmp_path / "missing.npz")
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_loader_producer_exits_on_abandoned_epoch(tmp_path):
    """Breaking out of an epoch must not strand the producer thread in
    q.put (regression: blocking put + full prefetch queue = leaked thread
    and a held batch of volumes per abandoned epoch)."""
    ds = _mk_ds(tmp_path, n=12)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)  # producer now prefetching ahead; queue fills
    it.close()  # abandon mid-epoch (generator finalizer sets stop)
    t = loader._last_producer
    t.join(timeout=5)
    assert not t.is_alive(), "producer thread leaked after abandoned epoch"


def test_loader_widens_int16_npz(tmp_path):
    """int16/uint16 raw volumes load as float32 with exact values."""
    rng = np.random.RandomState(0)
    raw = (rng.randint(-500, 3000, size=(6, 8, 8))).astype(np.int16)
    p = str(tmp_path / "i16.npz")
    np.savez(p, data=raw)
    ds = VolumeDataset(paths=[p], labels=np.asarray([0]),
                       transform=lambda v: v, train=False)
    vol = ds.load(0)
    assert vol.dtype == np.float32 and vol.shape == (1, 6, 8, 8)
    np.testing.assert_array_equal(vol[0], raw.astype(np.float32))
