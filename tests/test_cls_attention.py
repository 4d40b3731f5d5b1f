"""CLS-query attention kernel + the pool='cls' last-layer fast path.

The fast path must be EXACT math: logits with GAVIKO_CLS_FAST on and off
may differ only by float rounding (same row-wise ops, different schedules).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_kernel_matches_reference_across_geometries():
    from gaviko_tpu.ops.cls_attention import (
        cls_attention,
        cls_attention_reference,
        cls_attention_supported,
    )

    rng = np.random.RandomState(0)
    for (B, N, h, dh, n_true) in [
        (3, 1008, 12, 64, 1001),   # vit-b16 full geometry (padded stream)
        (2, 128, 4, 64, 128),      # no padding
        (1, 64, 8, 64, 57),        # ragged tail
        (4, 16, 2, 64, 11),        # tiny
    ]:
        inner = h * dh
        kv = jnp.asarray(rng.randn(B, N, 2 * inner), jnp.float32)
        q0 = jnp.asarray(rng.randn(B, inner), jnp.float32)
        assert cls_attention_supported(h, dh, N, kv.dtype)
        got = cls_attention(kv, q0, h, dh, dh ** -0.5, n_true)
        want = cls_attention_reference(kv, q0, h, dh, dh ** -0.5, n_true)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=f"{(B, N, h, dh)}")


def test_reference_matches_torch_single_query():
    """The math itself vs torch full attention restricted to row 0."""
    torch = pytest.importorskip("torch")
    from gaviko_tpu.ops.cls_attention import cls_attention_reference

    rng = np.random.RandomState(1)
    B, N, h, dh = 2, 96, 4, 64
    inner = h * dh
    kv = rng.randn(B, N, 2 * inner).astype(np.float32)
    q0 = rng.randn(B, inner).astype(np.float32)
    k = torch.tensor(kv[..., :inner]).reshape(B, N, h, dh).permute(0, 2, 1, 3)
    v = torch.tensor(kv[..., inner:]).reshape(B, N, h, dh).permute(0, 2, 1, 3)
    q = torch.tensor(q0).reshape(B, 1, h, dh).permute(0, 2, 1, 3)
    s = (q @ k.transpose(-1, -2)) * dh ** -0.5
    want = (s.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(B, inner).numpy()
    got = cls_attention_reference(
        jnp.asarray(kv), jnp.asarray(q0), h, dh, dh ** -0.5, N)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _tiny_logits(fast: str) -> np.ndarray:
    from gaviko_tpu.models.factory import build_model

    os.environ["GAVIKO_CLS_FAST"] = fast
    try:
        cfg = dict(image_size=32, image_patch_size=16, frames=24,
                   frame_patch_size=12, num_classes=5, channels=1,
                   pool="cls", backbone="vit-t16", method="fft",
                   dropout=0.1, emb_dropout=0.1)
        m = build_model(cfg)
        p = m.init(jax.random.PRNGKey(0), m.spec)
        vol = jnp.asarray(np.random.RandomState(1).rand(3, 1, 24, 32, 32),
                          jnp.float32)
        return np.asarray(jax.jit(lambda p, x: m.apply(p, x, m.spec))(p, vol))
    finally:
        os.environ.pop("GAVIKO_CLS_FAST", None)


def test_vit_fast_path_is_exact():
    full = _tiny_logits("0")
    fast = _tiny_logits("1")
    np.testing.assert_allclose(fast, full, atol=1e-5)


_METHOD_CFGS = {
    "shallow_vpt": dict(num_prompts=4, prompt_dim=6, prompt_dropout=0.1,
                        freeze_vit=True),
    "deep_vpt": dict(num_prompts=4, prompt_dim=6, prompt_dropout=0.1,
                     freeze_vit=True),
    "adaptformer": dict(freeze_vit=True),
    "ssf": dict(freeze_vit=True),
    "melo": dict(r=2, alpha=4, freeze_vit=True),
    "evp": dict(freq_nums=0.25, tuning_stage=1234, handcrafted_tune=True,
                embedding_tune=True, adaptor="adaptor", freeze_vit=True),
    "gaviko": dict(num_prompts=8, prompt_latent_dim=12, local_dim=12,
                   local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.2,
                   proj_drop=0.2, share_factor=1, freeze_vit=True),
}


@pytest.mark.parametrize("method", sorted(_METHOD_CFGS))
def test_method_fast_path_is_exact(method):
    """Every pool='cls' method's eval logits must be identical (to float
    rounding) with the last-layer fast path on and off."""
    from gaviko_tpu.models.factory import build_model

    outs = {}
    for fast in ("0", "1"):
        os.environ["GAVIKO_CLS_FAST"] = fast
        try:
            cfg = dict(image_size=32, image_patch_size=16, frames=24,
                       frame_patch_size=12, num_classes=5, channels=1,
                       pool="cls", backbone="vit-t16", method=method,
                       dropout=0.1, emb_dropout=0.1,
                       **_METHOD_CFGS[method])
            m = build_model(cfg)
            p = m.init(jax.random.PRNGKey(0), m.spec)
            vol = jnp.asarray(
                np.random.RandomState(1).rand(2, 1, 24, 32, 32), jnp.float32)
            outs[fast] = np.asarray(
                jax.jit(lambda p, x: m.apply(p, x, m.spec))(p, vol))
        finally:
            os.environ.pop("GAVIKO_CLS_FAST", None)
    np.testing.assert_allclose(outs["1"], outs["0"], atol=1e-5)


def _tiny_grads(fast: str):
    """Loss grads w.r.t. ALL params at dropout=0, fast path on/off."""
    from gaviko_tpu.models.factory import build_model

    os.environ["GAVIKO_CLS_FAST"] = fast
    try:
        cfg = dict(image_size=32, image_patch_size=16, frames=24,
                   frame_patch_size=12, num_classes=5, channels=1,
                   pool="cls", backbone="vit-t16", method="fft",
                   dropout=0.0, emb_dropout=0.0)
        m = build_model(cfg)
        p = m.init(jax.random.PRNGKey(0), m.spec)
        vol = jnp.asarray(np.random.RandomState(1).rand(2, 1, 24, 32, 32),
                          jnp.float32)
        y = jnp.asarray([1, 3])

        def loss(p):
            logits = m.apply(p, vol, m.spec, train=True,
                             rng=jax.random.PRNGKey(1))
            return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(2), y])

        return jax.jit(jax.grad(loss))(p)
    finally:
        os.environ.pop("GAVIKO_CLS_FAST", None)


def test_train_gradients_fast_vs_full_are_equal():
    """The training fast path must produce the same gradients as the full
    stack for EVERY parameter — the discarded rows of the last layer carry
    identically-zero cotangents, and dK/dV still reach all rows' params."""
    gf = _tiny_grads("0")
    gq = _tiny_grads("1")
    assert set(gf) == set(gq)
    for k in sorted(gf):
        np.testing.assert_allclose(
            np.asarray(gq[k]), np.asarray(gf[k]), atol=2e-5, err_msg=k)
