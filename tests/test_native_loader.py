"""Native C++ loader core: build, correctness vs numpy, throughput sanity."""

import numpy as np
import pytest

from gaviko_tpu.data import native_loader
from gaviko_tpu.data.transforms import rescale_intensity


def test_native_builds_and_matches_numpy():
    if not native_loader.native_available():
        pytest.skip("no g++ toolchain in this environment")
    rng = np.random.RandomState(0)
    x = (rng.rand(1, 60, 80, 80).astype(np.float32) * 512 - 100)
    got = native_loader.rescale_intensity_native(x)
    lo, hi = x.min(), x.max()
    want = (x - lo) / (hi - lo)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.min() == 0.0 and abs(got.max() - 1.0) < 1e-6

    # Constant volume edge case.
    c = np.full((1, 4, 4, 4), 7.0, np.float32)
    assert (native_loader.rescale_intensity_native(c) == 0.0).all()


def test_transform_dispatch_consistent():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 24, 32, 32).astype(np.float32) * 3
    out = rescale_intensity(x)
    lo, hi = x.min(), x.max()
    np.testing.assert_allclose(out, (x - lo) / (hi - lo), atol=1e-6)


def test_native_faster_than_numpy_on_full_volume():
    if not native_loader.native_available():
        pytest.skip("no g++ toolchain")
    import time

    x = np.random.RandomState(2).rand(1, 120, 160, 160).astype(np.float32)

    def np_path():
        lo, hi = x.min(), x.max()
        return (x - lo) / (hi - lo)

    native_loader.rescale_intensity_native(x)  # warm
    t0 = time.time()
    for _ in range(5):
        np_path()
    t_np = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        native_loader.rescale_intensity_native(x)
    t_nat = time.time() - t0
    # Don't enforce a ratio (CI noise); just log + sanity bound.
    print(f"numpy {t_np*200:.1f} ms/vol vs native {t_nat*200:.1f} ms/vol")
    assert t_nat < t_np * 3


def test_widen_f32_matches_numpy_all_dtypes():
    from gaviko_tpu.data.native_loader import widen_f32

    rng = np.random.RandomState(1)
    for dtype in (np.int16, np.uint16, np.float32, np.float64, np.uint8):
        x = (rng.rand(64, 33) * 1000).astype(dtype)
        out = widen_f32(x)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, x.astype(np.float32))
        # Fresh buffer: mutating the output must not touch the input.
        if x.dtype == np.float32:
            out[0, 0] += 1
            assert out[0, 0] != x[0, 0]
