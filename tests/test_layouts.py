"""put_volume: host->device transfer helper (pinned row-major on TPU,
plain transfer on CPU). On the CPU test platform we can only verify
semantics (values/dtype/shape and the jax.Array passthrough), not the
layout pinning itself — that is exercised on-chip (see ARCHITECTURE.md
round-3 notes: B8 pinned forward bit-equal to the default path)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaviko_tpu.utils.layouts import put_volume


def test_put_volume_numpy_roundtrip():
    x = np.random.RandomState(0).rand(2, 1, 6, 8, 8).astype(np.float32)
    y = put_volume(x)
    assert isinstance(y, jax.Array)
    assert y.shape == x.shape and y.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(y), x)


def test_put_volume_casts_on_host():
    x = np.random.RandomState(1).rand(2, 1, 6, 8, 8).astype(np.float64)
    y = put_volume(x, jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(y), x.astype(jnp.bfloat16))


def test_put_volume_passthrough_jax_array():
    x = jnp.ones((3, 4), jnp.float32)
    assert put_volume(x) is x
    y = put_volume(x, jnp.bfloat16)
    assert y.dtype == jnp.bfloat16


def test_put_volume_low_rank_labels_path():
    lab = np.arange(8, dtype=np.int32)
    y = put_volume(lab)
    assert y.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(y), lab)
