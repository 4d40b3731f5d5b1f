"""Flash attention kernel correctness vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.ops.attention import _xla_attention
from gaviko_tpu.ops.flash_attention import flash_attention, flash_local_attention
from gaviko_tpu.ops.local_attention import masked_local_attention


@pytest.mark.parametrize("shape", [(2, 3, 130, 64), (1, 2, 1001, 64), (2, 1, 96, 32)])
def test_flash_matches_xla(shape):
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(*shape).astype(np.float32)) for _ in range(3))
    scale = shape[-1] ** -0.5
    want = _xla_attention(q, k, v, scale=scale, dropout_rate=0.0,
                          dropout_enabled=False, rngs=None)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_streaming_regime_matches_xla():
    """N > WHOLE_K_MAX exercises the blockwise online-softmax kernel."""
    rng = np.random.RandomState(5)
    shape = (1, 1, 2560, 64)  # > 2048 -> streaming path (+ pad-to-512 tail)
    q, k, v = (jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.2)
               for _ in range(3))
    scale = shape[-1] ** -0.5
    want = _xla_attention(q, k, v, scale=scale, dropout_rate=0.0,
                          dropout_enabled=False, rngs=None)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_streaming_ragged_tail():
    """Non-multiple-of-512 N pads and masks the tail keys."""
    rng = np.random.RandomState(6)
    shape = (1, 1, 2200, 64)
    q, k, v = (jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.2)
               for _ in range(3))
    scale = shape[-1] ** -0.5
    want = _xla_attention(q, k, v, scale=scale, dropout_rate=0.0,
                          dropout_enabled=False, rngs=None)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_match():
    rng = np.random.RandomState(1)
    shape = (1, 2, 40, 16)
    q, k, v = (jnp.asarray(rng.randn(*shape).astype(np.float32)) for _ in range(3))
    scale = 0.25

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale, dropout_rate=0.0,
                                      dropout_enabled=False, rngs=None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("DHW,local_k", [((10, 10, 10), (6, 6, 6)),
                                         ((4, 5, 5), (3, 2, 4))])
def test_flash_local_matches_xla(DHW, local_k):
    rng = np.random.RandomState(2)
    N = DHW[0] * DHW[1] * DHW[2]
    q, k, v = (jnp.asarray(rng.randn(2, N, 20).astype(np.float32)) for _ in range(3))
    scale = 768 ** -0.5
    want = masked_local_attention(q, k, v, scale=scale, DHW=DHW, local_k=local_k,
                                  impl="xla")
    got = flash_local_attention(q, k, v, jnp.zeros((1,), jnp.int32), scale, DHW, local_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
