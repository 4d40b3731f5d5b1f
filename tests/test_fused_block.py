"""Residual-fused block wrappers: equivalence with the composed `+ x` path."""

import numpy as np

import jax.numpy as jnp

from gaviko_tpu.config import make_spec
from gaviko_tpu.core import vit as vit_core
from gaviko_tpu.ops.fused_mlp import fused_mlp, mlp_reference


def _noseed():
    return jnp.zeros((1,), jnp.int32)


def test_attention_block_res_matches_composed():
    from dataclasses import replace

    heads, dh = 2, 64
    dim = heads * dh
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 24, dim).astype(np.float32))
    p = {
        "blk.norm.weight": jnp.asarray(
            1.0 + 0.1 * rng.randn(dim).astype(np.float32)),
        "blk.norm.bias": jnp.asarray(0.1 * rng.randn(dim).astype(np.float32)),
        "blk.to_qkv.weight": jnp.asarray(
            (rng.randn(3 * dim, dim) * 0.05).astype(np.float32)),
        "blk.to_out.0.weight": jnp.asarray(
            (rng.randn(dim, dim) * 0.05).astype(np.float32)),
        "blk.to_out.0.bias": jnp.asarray(
            0.1 * rng.randn(dim).astype(np.float32)),
    }
    spec = make_spec(dict(
        image_size=32, image_patch_size=16, frames=24, frame_patch_size=12,
        num_classes=2, channels=1, pool="cls", backbone="vit-t16",
        method="fft",
    ))
    spec = replace(spec, heads=heads, dim_head=dh, dim=dim, dropout=0.0)
    want = vit_core.attention_block(p, "blk", x, spec, n_true=21) + x
    got = vit_core.attention_block_res(p, "blk", x, spec, n_true=21)
    np.testing.assert_allclose(
        np.asarray(got)[:, :21], np.asarray(want)[:, :21], atol=2e-5
    )


def test_fused_mlp_residual():
    rng = np.random.RandomState(3)
    B, N, dim, mlp = 2, 16, 128, 256
    x = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    gamma = jnp.ones((dim,), jnp.float32)
    beta = jnp.zeros((dim,), jnp.float32)
    w1 = jnp.asarray((rng.randn(mlp, dim) * 0.05).astype(np.float32))
    b1 = jnp.zeros((mlp,), jnp.float32)
    w2 = jnp.asarray((rng.randn(dim, mlp) * 0.05).astype(np.float32))
    b2 = jnp.zeros((dim,), jnp.float32)
    got = fused_mlp(x, gamma, beta, w1, b1, w2, b2, _noseed(), 1e-5, True,
                    0.0, True)
    want = mlp_reference(x, gamma, beta, w1, b1, w2, b2, _noseed(), 1e-5,
                         True, 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    branch = fused_mlp(x, gamma, beta, w1, b1, w2, b2, _noseed(), 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(branch + x), atol=2e-5
    )


def test_feedforward_block_res_matches_composed():
    from dataclasses import replace

    from gaviko_tpu.ops import attention as attn_mod

    dim, mlp = 128, 256
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, dim).astype(np.float32))
    p = {
        "ff.net.0.weight": jnp.ones((dim,), jnp.float32),
        "ff.net.0.bias": jnp.zeros((dim,), jnp.float32),
        "ff.net.1.weight": jnp.asarray(
            (rng.randn(mlp, dim) * 0.05).astype(np.float32)),
        "ff.net.1.bias": jnp.zeros((mlp,), jnp.float32),
        "ff.net.4.weight": jnp.asarray(
            (rng.randn(dim, mlp) * 0.05).astype(np.float32)),
        "ff.net.4.bias": jnp.zeros((dim,), jnp.float32),
    }
    spec = make_spec(dict(
        image_size=32, image_patch_size=16, frames=24, frame_patch_size=12,
        num_classes=2, channels=1, pool="cls", backbone="vit-t16",
        method="fft",
    ))
    spec = replace(spec, dim=dim, mlp_dim=mlp, dropout=0.0, gelu="tanh")
    want = vit_core.feedforward_block(p, "ff", x, spec) + x
    prev = attn_mod._DEFAULT_IMPL
    attn_mod.set_default_impl("flash")  # force the fused kernel on CPU
    try:
        got = vit_core.feedforward_block_res(p, "ff", x, spec)
    finally:
        attn_mod.set_default_impl(prev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
