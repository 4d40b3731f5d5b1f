"""Fused LN+Linear kernel: equivalence with layer_norm + matmul, and VJP."""

import numpy as np

import jax
import jax.numpy as jnp

from gaviko_tpu.core.layers import layer_norm
from gaviko_tpu.ops.ln_linear import (
    fused_ln_linear,
    ln_linear_hybrid,
    ln_linear_hybrid_supported,
    ln_linear_reference,
    ln_linear_supported,
)


def _inputs(B=2, N=24, dim=128, out=384, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(dim).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(dim).astype(np.float32))
    w = jnp.asarray((rng.randn(out, dim) * 0.05).astype(np.float32))
    return x, gamma, beta, w


def test_matches_layer_norm_matmul():
    x, gamma, beta, w = _inputs()
    got = fused_ln_linear(x, gamma, beta, w)
    p = {"n.weight": gamma, "n.bias": beta}
    want = layer_norm(p, "n", x) @ w.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    want_ref = ln_linear_reference(x, gamma, beta, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_ref),
                               atol=2e-5)


def test_gradients_match():
    x, gamma, beta, w = _inputs(B=1, N=16)

    def loss_fused(x, gamma, beta, w):
        return jnp.sum(fused_ln_linear(x, gamma, beta, w) ** 2)

    def loss_ref(x, gamma, beta, w):
        return jnp.sum(ln_linear_reference(x, gamma, beta, w) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, gamma, beta, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, gamma, beta, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_hybrid_forward_and_gradients_match():
    """ln_linear_hybrid: XLA forward must equal the reference exactly, and
    its Pallas backward must match the pure-XLA VJP (the train-path qkv
    projection runs through this wrapper)."""
    x, gamma, beta, w = _inputs()
    np.testing.assert_allclose(
        np.asarray(ln_linear_hybrid(x, gamma, beta, w)),
        np.asarray(ln_linear_reference(x, gamma, beta, w)), atol=0.0)

    def loss_hybrid(x, gamma, beta, w):
        return jnp.sum(ln_linear_hybrid(x, gamma, beta, w) ** 2)

    def loss_ref(x, gamma, beta, w):
        return jnp.sum(ln_linear_reference(x, gamma, beta, w) ** 2)

    g1 = jax.grad(loss_hybrid, argnums=(0, 1, 2, 3))(x, gamma, beta, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, gamma, beta, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_supported_gate():
    assert ln_linear_supported(768, 2304, jnp.bfloat16)
    assert not ln_linear_supported(192, 576, jnp.bfloat16)  # 576 % 128 != 0
    # vit-l16 declined: measured slower than XLA at that geometry.
    assert not ln_linear_supported(1024, 3072, jnp.bfloat16)
