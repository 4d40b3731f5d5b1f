"""Fused MLP kernel correctness + gradients vs the unfused path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.ops.fused_mlp import fused_mlp, fused_mlp_supported


def _inputs(dim=128, mlp=256, rows=70, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, rows, dim).astype(np.float32))
    gamma = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.1 + 1)
    beta = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.1)
    w1 = jnp.asarray((rng.randn(dim, mlp) * 0.05).astype(np.float32))
    b1 = jnp.asarray(rng.randn(mlp).astype(np.float32) * 0.1)
    w2 = jnp.asarray((rng.randn(mlp, dim) * 0.05).astype(np.float32))
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.1)
    return x, gamma, beta, w1, b1, w2, b2


def _reference(x, gamma, beta, w1, b1, w2, b2, approximate=False):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    h = h * gamma + beta
    h = h @ w1 + b1
    h = jax.nn.gelu(h, approximate=approximate)
    return h @ w2 + b2


@pytest.mark.parametrize("approximate", [False, True])
def test_fused_mlp_matches_reference(approximate):
    args = _inputs()
    got = fused_mlp(*args, 1e-5, approximate)
    want = _reference(*args, approximate=approximate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_mlp_gradients():
    args = _inputs(seed=1)

    def loss_fused(*a):
        return jnp.sum(fused_mlp(*a, 1e-5, False) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference(*a) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4)


def test_supported_predicate():
    assert fused_mlp_supported(768, 3072, jnp.bfloat16)
    assert not fused_mlp_supported(1024, 4096, jnp.float32)  # weights too big
    assert not fused_mlp_supported(100, 3072, jnp.bfloat16)  # lane misaligned
