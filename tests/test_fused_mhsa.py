"""Fused layout-native MHSA: correctness (interpret mode) + model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.models.factory import build_model
from gaviko_tpu.ops import attention as attn_mod
from gaviko_tpu.ops.attention import _xla_attention
from gaviko_tpu.ops.flash_attention import fused_mhsa, fused_mhsa_supported


def _noseed():
    return jnp.zeros((1,), jnp.int32)

from tests.torch_ref import TINY_MODEL_CFG


def test_fused_matches_xla():
    B, H, N, D = 2, 4, 48, 64
    n_pad = 48
    rng = np.random.RandomState(0)
    inner = H * D
    qkv = jnp.asarray(rng.randn(B, n_pad, 3 * inner).astype(np.float32))
    n_true = 41

    got = fused_mhsa(qkv, _noseed(), H, D, D ** -0.5, n_true)

    def to_heads(t):
        return t.reshape(B, n_pad, H, D).transpose(0, 2, 1, 3)

    q = to_heads(qkv[..., :inner])[:, :, :n_true]
    k = to_heads(qkv[..., inner:2 * inner])[:, :, :n_true]
    v = to_heads(qkv[..., 2 * inner:])[:, :, :n_true]
    want = _xla_attention(q, k, v, scale=D ** -0.5, dropout_rate=0,
                          dropout_enabled=False, rngs=None)
    want = want.transpose(0, 2, 1, 3).reshape(B, n_true, inner)
    np.testing.assert_allclose(
        np.asarray(got)[:, :n_true], np.asarray(want), atol=2e-5
    )


def test_fused_gradients_match():
    B, H, N, D = 1, 2, 24, 64
    inner = H * D
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(rng.randn(B, N, 3 * inner).astype(np.float32))

    def loss_fused(qkv):
        return jnp.sum(fused_mhsa(qkv, _noseed(), H, D, 0.125, N) ** 2)

    def loss_ref(qkv):
        def to_heads(t):
            return t.reshape(B, N, H, D).transpose(0, 2, 1, 3)

        q, k, v = (to_heads(qkv[..., i * inner:(i + 1) * inner]) for i in range(3))
        o = _xla_attention(q, k, v, scale=0.125, dropout_rate=0,
                           dropout_enabled=False, rngs=None)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)


def test_model_parity_with_flash_default(tmp_path):
    """Force the flash/fused path (interpret mode on CPU) through the full
    model and check logits against the XLA path."""
    cfg = {**TINY_MODEL_CFG, "backbone": "vit-s16", "method": "fft"}
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 1, 24, 32, 32).astype(np.float32))

    attn_mod.set_default_impl("xla")
    want = model.apply(params, x, model.spec)
    attn_mod.set_default_impl("flash")
    try:
        got = model.apply(params, x, model.spec)
    finally:
        attn_mod.set_default_impl("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_gradients_hp_agnostic(monkeypatch):
    """GAVIKO_BWD_HP (heads per backward program) must not change gradients:
    the saved softmax stats are laid out per-HEAD (B, heads, n_pad, 2), so
    any hp dividing `heads` block-indexes the same (m, l) rows. Guards the
    layout contract between _fused_mhsa_forward's emit_ml and the backward
    (a per-head-PAIR layout here once made hp=4 silently read garbage
    stats). Dropout on, so the saved-l reconstruction path is exercised."""
    B, H, D, N = 1, 4, 64, 48
    inner = H * D
    rng = np.random.RandomState(4)
    qkv = jnp.asarray(rng.randn(B, N, 3 * inner).astype(np.float32))
    seed = jnp.asarray([7], jnp.int32)

    def loss(qkv):
        return jnp.sum(fused_mhsa(qkv, seed, H, D, 0.125, N, 0.2) ** 2)

    grads = {}
    for hp in ("2", "4"):
        monkeypatch.setenv("GAVIKO_BWD_HP", hp)
        grads[hp] = np.asarray(jax.grad(loss)(qkv))
    np.testing.assert_allclose(grads["2"], grads["4"], atol=1e-6)


def test_supported_predicate():
    assert fused_mhsa_supported(12, 64, 1001)
    assert not fused_mhsa_supported(3, 64, 1001)  # vit-t16 odd heads
    assert not fused_mhsa_supported(12, 64, 99999)


def test_fused_gradients_with_padding():
    """Backward kernel with pad rows/columns (n_true < n_pad)."""
    B, H, D = 1, 2, 64
    n_true, n_pad = 41, 48
    inner = H * D
    rng = np.random.RandomState(3)
    qkv = np.zeros((B, n_pad, 3 * inner), np.float32)
    qkv[:, :n_true] = rng.randn(B, n_true, 3 * inner)
    qkv = jnp.asarray(qkv)

    def loss_fused(qkv):
        out = fused_mhsa(qkv, _noseed(), H, D, 0.125, n_true)
        return jnp.sum(out[:, :n_true] ** 2)

    def loss_ref(qkv):
        def to_heads(t):
            return t.reshape(B, n_pad, H, D).transpose(0, 2, 1, 3)[:, :, :n_true]

        q, k, v = (to_heads(qkv[..., i * inner:(i + 1) * inner]) for i in range(3))
        o = _xla_attention(q, k, v, scale=0.125, dropout_rate=0,
                           dropout_enabled=False, rngs=None)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)


def test_prng_flag_inert_on_cpu(monkeypatch):
    """GAVIKO_DROPOUT_PRNG=1 must be a no-op off-TPU: pltpu.prng_* has no
    interpret-mode lowering, so the plan helper refuses and the hash path
    runs — outputs identical to the flag being unset. (The compiled-TPU
    behavior of the flag is verified on-chip by scripts/
    prng_dropout_probe.py: mask extraction, fwd/grad replay, stats.)"""
    B, H, D, N = 1, 4, 64, 48
    qkv = jnp.asarray(np.random.RandomState(0).randn(
        B, N, 3 * H * D).astype(np.float32))
    seed = jnp.asarray([3], jnp.int32)

    def run():
        return np.asarray(jax.grad(lambda x: jnp.sum(
            fused_mhsa(x, seed, H, D, 0.125, N, 0.2) ** 2))(qkv))

    base = run()
    monkeypatch.setenv("GAVIKO_DROPOUT_PRNG", "1")
    jax.clear_caches()
    np.testing.assert_array_equal(base, run())


def test_mhsa_qkv_proj_matches_separate_vjps():
    """mhsa_qkv_proj (projection + attention under one custom VJP, so the
    backward emits dh/dW without packing a dqkv cotangent) must match the
    separate h@w.T + fused_mhsa composition in BOTH forward value and
    (dh, dw) gradients, with and without in-kernel dropout."""
    from gaviko_tpu.ops.flash_attention import mhsa_qkv_proj

    B, H, N, D = 2, 4, 48, 64
    dim = 128
    inner = H * D
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(B, N, dim).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(3 * inner, dim).astype(np.float32) * 0.05)
    n_true = 41
    seed = jnp.asarray([17], jnp.int32)

    for drop in (0.0, 0.2):
        def loss_fused(h, w):
            o = mhsa_qkv_proj(h, w, seed, H, D, D ** -0.5, n_true, drop)
            return jnp.sum(o[:, :n_true] ** 2)

        def loss_ref(h, w):
            o = fused_mhsa(h @ w.T, seed, H, D, D ** -0.5, n_true, drop)
            return jnp.sum(o[:, :n_true] ** 2)

        v1, (dh1, dw1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(h, w)
        v2, (dh2, dw2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dh1), np.asarray(dh2),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                                   atol=2e-4, rtol=1e-3)
