"""In-kernel hash dropout: fused kernels vs exact XLA replays (same seed).

The mask bits come from a stateless coordinate hash (ops/hash_dropout.py)
that runs identically inside Pallas kernels (interpret mode here) and in
plain XLA, so forward AND custom-VJP backward can be checked for exact
agreement on CPU — the property that lets the fused kernels carry the real
training workload (ref trains with dropout: src/train.py:257-361,
vision_transformer.py:26-70, gaviko.py:229-244).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.ops.flash_attention import (
    flash_local_attention,
    fused_mhsa,
    local_reference,
    mhsa_reference,
)
from gaviko_tpu.ops.fused_mlp import fused_mlp, mlp_reference
from gaviko_tpu.ops.hash_dropout import keep_mask, seed_from_key

RATE = 0.2


def _seed(i=0):
    return seed_from_key(jax.random.PRNGKey(i)).reshape(1)


def test_keep_mask_statistics():
    m = np.asarray(keep_mask((512, 512), _seed()[0], RATE))
    assert abs(m.mean() - (1 - RATE)) < 0.01
    # Different seeds decorrelate.
    m2 = np.asarray(keep_mask((512, 512), _seed(1)[0], RATE))
    joint = (m & m2).mean()
    assert abs(joint - (1 - RATE) ** 2) < 0.01


def test_fused_mhsa_dropout_forward_matches_reference():
    B, H, D = 2, 4, 64
    n_pad, n_true = 48, 41
    qkv = jnp.asarray(np.random.RandomState(0).randn(B, n_pad, 3 * H * D)
                      .astype(np.float32))
    seed = _seed()
    got = fused_mhsa(qkv, seed, H, D, D ** -0.5, n_true, RATE)
    want = mhsa_reference(qkv, seed, H, D, D ** -0.5, n_true, RATE)
    np.testing.assert_allclose(
        np.asarray(got)[:, :n_true], np.asarray(want)[:, :n_true], atol=3e-5
    )
    # Dropout actually drops: eval output differs.
    no_drop = fused_mhsa(qkv, seed, H, D, D ** -0.5, n_true, 0.0)
    assert np.abs(np.asarray(got)[:, :n_true]
                  - np.asarray(no_drop)[:, :n_true]).max() > 1e-3


def test_fused_mhsa_dropout_gradients_match_reference():
    """The Pallas backward replays the identical mask."""
    B, H, D = 1, 2, 64
    N = 24
    qkv = jnp.asarray(np.random.RandomState(1).randn(B, N, 3 * H * D)
                      .astype(np.float32))
    seed = _seed(2)

    g1 = jax.grad(lambda t: jnp.sum(
        fused_mhsa(t, seed, H, D, 0.125, N, RATE) ** 2))(qkv)
    g2 = jax.grad(lambda t: jnp.sum(
        mhsa_reference(t, seed, H, D, 0.125, N, RATE) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)


def test_local_attention_dropout_forward_and_grads():
    B, N, dl = 2, 24, 16
    DHW, local_k = (2, 3, 4), (2, 2, 3)
    rng = np.random.RandomState(3)
    q, k, v = (jnp.asarray(rng.randn(B, N, dl).astype(np.float32))
               for _ in range(3))
    seed = _seed(4)
    got = flash_local_attention(q, k, v, seed, 0.2, DHW, local_k, RATE)
    want = local_reference(q, k, v, seed, 0.2, DHW, local_k, RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    g1 = jax.grad(lambda q: jnp.sum(
        flash_local_attention(q, k, v, seed, 0.2, DHW, local_k, RATE) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(
        local_reference(q, k, v, seed, 0.2, DHW, local_k, RATE) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)


def test_fused_mlp_dropout_forward_and_grads():
    dim, mlp, rows = 128, 256, 70
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, rows, dim).astype(np.float32))
    gamma = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.1 + 1)
    beta = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(mlp, dim).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(mlp).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(dim, mlp).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.05)
    seed = _seed(6)
    args = (x, gamma, beta, w1, b1, w2, b2, seed)

    got = fused_mlp(*args, 1e-5, False, RATE)
    want = mlp_reference(*args, 1e-5, False, RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    g1 = jax.grad(lambda x: jnp.sum(fused_mlp(
        x, gamma, beta, w1, b1, w2, b2, seed, 1e-5, False, RATE) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(mlp_reference(
        x, gamma, beta, w1, b1, w2, b2, seed, 1e-5, False, RATE) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)


def test_training_forward_uses_fused_kernels_with_dropout():
    """vit-s16 fft in training mode: the fused path (flash impl) runs with
    in-kernel dropout, is rng-deterministic, and actually drops."""
    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.ops import attention as attn_mod

    from tests.torch_ref import TINY_MODEL_CFG

    cfg = {**TINY_MODEL_CFG, "backbone": "vit-s16", "method": "fft"}
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    x = jnp.asarray(np.random.RandomState(7).rand(2, 1, 24, 32, 32)
                    .astype(np.float32))

    attn_mod.set_default_impl("flash")
    try:
        rng = jax.random.PRNGKey(1)
        t1 = model.apply(params, x, model.spec, train=True, rng=rng)
        t2 = model.apply(params, x, model.spec, train=True, rng=rng)
        t3 = model.apply(params, x, model.spec, train=True,
                         rng=jax.random.PRNGKey(2))
        ev = model.apply(params, x, model.spec)
    finally:
        attn_mod.set_default_impl("xla")
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))  # rng-det
    assert np.abs(np.asarray(t1) - np.asarray(t3)).max() > 1e-6  # stochastic
    assert np.abs(np.asarray(t1) - np.asarray(ev)).max() > 1e-6  # drops


def test_gaviko_local_train_flash_equals_xla():
    """GAViKO's local attention under training dropout is bit-identical
    between the flash kernel and the XLA impl (same hash seed)."""
    from gaviko_tpu.models.factory import build_model

    from tests.torch_ref import TINY_MODEL_CFG

    cfg = {**TINY_MODEL_CFG, "method": "gaviko", "freeze_vit": True,
           "num_prompts": 5, "prompt_latent_dim": 12, "local_dim": 12,
           "local_k": [2, 2, 2], "DHW": [2, 2, 2], "attn_drop": 0.2,
           "proj_drop": 0.2, "share_factor": 1}
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    x = jnp.asarray(np.random.RandomState(8).rand(2, 1, 24, 32, 32)
                    .astype(np.float32))
    rng = jax.random.PRNGKey(3)
    from gaviko_tpu.models import gaviko as gaviko_mod

    a = gaviko_mod.apply(params, x, model.spec, train=True, rng=rng,
                         local_impl="flash")
    b = gaviko_mod.apply(params, x, model.spec, train=True, rng=rng,
                         local_impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_keep_mask_pairwise_independence():
    """mix_lite quality gate (advisor finding): the 2-op mix must not
    correlate drops across adjacent rows, columns, or salts, or the
    effective regularization silently degrades. For independent masks the
    joint keep probability is (1-q)^2; we bound the empirical pairwise
    deviation over large planes."""
    q = RATE
    m = np.asarray(keep_mask((1024, 1024), _seed()[0], q))
    pk = 1.0 - q
    # ~3.4M pairs per comparison: sampling noise on the joint rate is
    # ~sqrt(p(1-p)/n) ~ 2.3e-4; allow 20x for safety — a real linear
    # correlation artifact would show up at the 1e-2 level.
    tol = 5e-3

    def joint(a, b):
        return float(np.mean(a & b))

    # Adjacent rows / adjacent columns (the linearly-structured coordinates).
    assert abs(joint(m[:-1], m[1:]) - pk * pk) < tol
    assert abs(joint(m[:, :-1], m[:, 1:]) - pk * pk) < tol
    # Row stride 8 / column stride 128 (TPU tile strides).
    assert abs(joint(m[:-8], m[8:]) - pk * pk) < tol
    assert abs(joint(m[:, :-128], m[:, 128:]) - pk * pk) < tol
    # Same coordinates, adjacent salts (batch*head planes of one call).
    m_s1 = np.asarray(keep_mask((1024, 1024), _seed()[0], q, salt=1))
    assert abs(joint(m, m_s1) - pk * pk) < tol
    # Same coordinates, adjacent seeds (successive steps).
    m2 = np.asarray(keep_mask((1024, 1024), _seed(1)[0], q))
    assert abs(joint(m, m2) - pk * pk) < tol
    # Diagonal neighbours (row+1, col+1) — the sum row*R+col*C changes by
    # R+C there, a constant: the mix must still decorrelate it.
    assert abs(joint(m[:-1, :-1], m[1:, 1:]) - pk * pk) < tol


def test_rng_stream_batched_derivation_matches_per_site_fold_in():
    """RngStream derives keys/seeds in vectorized blocks (one batched
    threefry per 64 sites — an op-count optimization for the train step);
    the handout must stay bit-identical to the per-site
    fold_in(key, count) / seed_from_key chain it replaced, including
    across a block-growth boundary (site 65+) and for both raw uint32
    and new-style typed keys."""
    from gaviko_tpu.core.layers import RngStream

    for mk in (jax.random.PRNGKey(7), jax.random.key(7)):
        s = RngStream(mk)
        for i in range(1, 70):
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(s.next())),
                np.asarray(jax.random.key_data(jax.random.fold_in(mk, i))),
            )
        s2 = RngStream(mk)
        for i in range(1, 70):
            assert int(s2.next_seed()) == int(
                seed_from_key(jax.random.fold_in(mk, i))
            )
