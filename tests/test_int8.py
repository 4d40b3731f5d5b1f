"""Opt-in w8a8 serving path (ops/int8_linear.py): quantization math and
end-to-end quality budget vs the bf16/f32 path, on CPU interpret mode
(int math is exact either way, so these results transfer to the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaviko_tpu.ops.int8_linear import (
    INT8_SUFFIX,
    SCALE_SUFFIX,
    int8_linear,
    int8_mlp,
    quantize_backbone,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    w_i8, scale = quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and scale.shape == (1, 128)
    deq = np.asarray(w_i8, np.float32) * np.asarray(scale).T
    # Per-channel symmetric: error bounded by scale/2 per element.
    err = np.abs(deq - np.asarray(w))
    assert (err <= np.asarray(scale).T / 2 + 1e-7).all()


def test_int8_linear_matches_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 40, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.01)
    w_i8, scale = quantize_weight(w)
    got = int8_linear(x, w_i8, scale, bias=b)
    ref = x @ w.T + b
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 2e-2, rel


def test_int8_linear_with_ln():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 40, 256).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.randn(256).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(256).astype(np.float32))
    w = jnp.asarray(rng.randn(384, 256).astype(np.float32) * 0.05)
    w_i8, scale = quantize_weight(w)
    got = int8_linear(x, w_i8, scale, gamma=g, beta=be)
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + be
    ref = h @ w.T
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 2e-2, rel


def test_int8_mlp_matches_f32():
    rng = np.random.RandomState(3)
    dim, mlp = 256, 512
    x = jnp.asarray(rng.randn(1, 24, dim).astype(np.float32))
    g = jnp.ones((dim,), jnp.float32)
    be = jnp.zeros((dim,), jnp.float32)
    w1 = jnp.asarray(rng.randn(mlp, dim).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(mlp).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.randn(dim, mlp).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.01)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    got = int8_mlp(x, g, be, w1q, s1, b1, w2q, s2, b2, residual=True)
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    a = h @ w1.T + b1
    ga = jax.nn.gelu(a, approximate=True)
    ref = ga @ w2.T + b2 + xf
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 3e-2, rel


@pytest.mark.parametrize("method", ["fft"])
def test_int8_model_logit_budget(method):
    """Full vit-t16 forward: int8-sidecar logits vs the plain path."""
    from gaviko_tpu.models.factory import build_model

    cfg = dict(image_size=32, image_patch_size=16, frames=24,
               frame_patch_size=12, num_classes=5, channels=1, pool="cls",
               backbone="vit-t16", method=method, dropout=0.1,
               emb_dropout=0.1)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    vol = jnp.asarray(
        np.random.RandomState(0).rand(2, 1, 24, 32, 32).astype(np.float32))
    base = model.apply(params, vol, model.spec)
    qparams = quantize_backbone(params, model.spec.depth)
    assert any(k.endswith(INT8_SUFFIX) for k in qparams)
    assert any(k.endswith(SCALE_SUFFIX) for k in qparams)
    quant = model.apply(qparams, vol, model.spec)
    rel = float(jnp.mean(jnp.abs(quant - base)) / jnp.mean(jnp.abs(base)))
    assert rel < 5e-2, rel
    # Argmax agreement on this batch (classification contract).
    assert (jnp.argmax(quant, -1) == jnp.argmax(base, -1)).all()
    # Training path must ignore the sidecars entirely (int8 is serving-only).
    t_base = model.apply(params, vol, model.spec, train=True,
                         rng=jax.random.PRNGKey(7))
    t_quant = model.apply(qparams, vol, model.spec, train=True,
                          rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(t_base), np.asarray(t_quant))


def test_int8_gaviko_logit_budget():
    """GAViKO (attns/mlps naming + dual streams): int8 backbone GEMMs."""
    from gaviko_tpu.models.factory import build_model

    cfg = dict(image_size=32, image_patch_size=16, frames=24,
               frame_patch_size=12, num_classes=5, channels=1, pool="cls",
               backbone="vit-t16", method="gaviko", num_prompts=8,
               prompt_latent_dim=12, local_dim=12, local_k=[2, 2, 2],
               DHW=[2, 2, 2], attn_drop=0.2, proj_drop=0.2, share_factor=1,
               dropout=0.1, emb_dropout=0.1)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    vol = jnp.asarray(
        np.random.RandomState(4).rand(2, 1, 24, 32, 32).astype(np.float32))
    base = model.apply(params, vol, model.spec)
    qparams = quantize_backbone(params)
    assert any(k.startswith("transformer.attns.") and k.endswith(INT8_SUFFIX)
               for k in qparams)
    quant = model.apply(qparams, vol, model.spec)
    rel = float(jnp.mean(jnp.abs(quant - base)) / jnp.mean(jnp.abs(base)))
    assert rel < 5e-2, rel


def test_quantize_backbone_refuses_ssf_params():
    """SSF blocks bypass the int8-gated core paths (ssf_ada sits between LN
    and every GEMM), so quantize_backbone must return the params unchanged
    (regression: it used to add ~25% of resident sidecar memory that no code
    path consumed, silently serving full precision)."""
    import jax.numpy as jnp

    from gaviko_tpu.ops.int8_linear import INT8_SUFFIX, quantize_backbone

    params = {
        "transformer.layers.0.0.to_qkv.weight": jnp.ones((24, 8), jnp.bfloat16),
        "transformer.layers.0.0.ssf_scale_1": jnp.ones((8,), jnp.bfloat16),
    }
    out = quantize_backbone(params, 1)
    assert set(out) == set(params)
    assert not any(k.endswith(INT8_SUFFIX) for k in out)


def test_int8_eval_metrics_agree_with_fp(tmp_path):
    """A TRAINED checkpoint evaluated through the REAL metrics path
    (accuracy / quadratic kappa / macro-OVR AUC, eval.py --quantize int8)
    in fp vs w8a8 — the serving-mode accuracy claim rests on labeled-set
    metric agreement, not synthetic-logit MAE (round-4 verdict #6).
    Ref metric definitions: src/eval.py:120-122."""
    import os

    import pandas as pd

    import train as train_mod
    from gaviko_tpu.cli import evaluate as eval_cli
    from tests.test_end_to_end import tiny_config

    root = str(tmp_path)
    # Learnable spatial signal (bright left/right halves along H) so the
    # trained model's predictions are confident — agreement on near-tied
    # random logits would only measure quantization noise flipping coin
    # tosses.
    rng = np.random.RandomState(1)
    volumes = os.path.join(root, "volumes")
    os.makedirs(volumes)
    rows = []
    for i in range(12):
        label = i % 2
        vol = rng.rand(24, 32, 32).astype(np.float32) * 0.2
        if label:
            vol[:, :16] += 1.0
        else:
            vol[:, 16:] += 1.0
        name = f"v{i:02d}.npz"
        np.savez(os.path.join(volumes, name), data=vol)
        rows.append({"mri_path": name, "kl_grade": label,
                     "subset": "train" if i < 8 else "val"})
    csv_path = os.path.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    config = tiny_config(root, csv_path, volumes, method="fft", epochs=4)
    config["train"]["loss_fn"] = "cross_entropy"
    config["train"]["scheduler"]["max_lr"] = 1e-3
    result = train_mod.train(config)
    assert result["best_ckpt_path"]

    config["utils"]["checkpoint"] = result["best_ckpt_path"]
    fp = eval_cli.evaluate(config)
    config["utils"]["quantize"] = "int8"
    q8 = eval_cli.evaluate(config)

    fp_pred = pd.read_csv(fp["csv"])["outputs"]
    q8_pred = pd.read_csv(q8["csv"])["outputs"]
    agreement = float((fp_pred == q8_pred).mean())
    assert agreement == 1.0, (agreement, fp, q8)
    assert abs(fp["accuracy"] - q8["accuracy"]) <= 1e-9, (fp, q8)
    assert abs(fp["kappa"] - q8["kappa"]) <= 1e-9, (fp, q8)
    # AUC depends on the softmax probabilities, not just argmax; int8 GEMM
    # noise moves logits ~1e-2 relative, which can reorder near-tied
    # probabilities.
    assert abs(fp["auc"] - q8["auc"]) <= 0.05, (fp, q8)
