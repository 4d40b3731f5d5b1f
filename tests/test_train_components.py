"""Parity of loss / schedule / metrics against torch + sklearn oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from gaviko_tpu.train.losses import cross_entropy_loss, focal_loss
from gaviko_tpu.train.metrics import (
    accuracy,
    cohen_kappa_quadratic,
    roc_auc_ovr_macro,
)
from gaviko_tpu.train.schedule import onecycle_cos

from tests import torch_ref  # makes /root/reference/src importable


def test_focal_loss_matches_reference():
    import torch

    torch_ref._ensure_ref_importable()
    from losses.focal_loss import FocalLoss

    rng = np.random.RandomState(0)
    logits = rng.randn(16, 5).astype(np.float32) * 3
    labels = rng.randint(0, 5, size=16)

    ref = FocalLoss(gamma=1.2)
    want = ref(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=1.2))
    assert abs(got - want) < 1e-6, (got, want)

    # With ignore_index entries.
    labels2 = labels.copy()
    labels2[::5] = -100
    want2 = ref(torch.from_numpy(logits), torch.from_numpy(labels2)).item()
    got2 = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels2), gamma=1.2))
    assert abs(got2 - want2) < 1e-6


def test_corrected_focal_differs_but_sane():
    rng = np.random.RandomState(1)
    logits = rng.randn(8, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=8)
    fixed = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=1.2, parity=False))
    # gamma->0 reduces to CE.
    ce_like = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0, parity=False))
    ce = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ce_like - ce) < 1e-6
    assert 0 < fixed < ce_like + 1e-6


def test_cross_entropy_matches_torch():
    import torch

    rng = np.random.RandomState(2)
    logits = rng.randn(12, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=12)
    want = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-6


def test_onecycle_matches_torch():
    import torch

    total = 50
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=3e-4, total_steps=total, pct_start=0.3,
        div_factor=10.0, final_div_factor=1000.0,
        anneal_strategy="cos", three_phase=False,
    )
    ours = onecycle_cos(3e-4, total, 0.3, 10.0, 1000.0)
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    our_lrs = [float(ours(t)) for t in range(total)]
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5)


def test_metrics_match_sklearn():
    from sklearn.metrics import (
        accuracy_score,
        cohen_kappa_score,
        roc_auc_score,
    )

    rng = np.random.RandomState(3)
    n, c = 200, 5
    y_true = rng.randint(0, c, size=n)
    logits = rng.randn(n, c) + np.eye(c)[y_true] * 1.5
    proba = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    y_pred = proba.argmax(-1)

    assert abs(accuracy(y_true, y_pred) - accuracy_score(y_true, y_pred)) < 1e-12
    assert abs(
        cohen_kappa_quadratic(y_true, y_pred)
        - cohen_kappa_score(y_true, y_pred, weights="quadratic")
    ) < 1e-10
    assert abs(
        roc_auc_ovr_macro(y_true, proba)
        - roc_auc_score(y_true, proba, multi_class="ovr", average="macro")
    ) < 1e-10


def test_fused_optimizer_matches_optax_chain():
    """train/fused_optim.step must be numerically the optax
    chain(clip_by_global_norm, adam) + apply_updates it replaces."""
    import optax

    from gaviko_tpu.train import fused_optim

    rng = np.random.RandomState(0)
    params = {f"w{i}": jnp.asarray(rng.randn(9, 13).astype(np.float32))
              for i in range(4)}
    sched = lambda c: 0.01 * (1.0 + 0.5 * jnp.cos(  # noqa: E731
        c.astype(jnp.float32) * 0.1))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(learning_rate=sched, eps=1e-8))
    o = tx.init(params)
    s = fused_optim.init(params)
    p_ref = p_fused = params
    for it in range(4):
        # Alternate tiny/huge grads so BOTH clip branches are exercised.
        grads = {
            k: jnp.asarray(rng.randn(*v.shape).astype(np.float32))
            * (10.0 if it % 2 else 0.01)
            for k, v in params.items()
        }
        u, o = tx.update(grads, o, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p_fused, s = fused_optim.step(grads, s, p_fused, sched, clip=1.0,
                                      eps=1e-8)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p_ref[k]), np.asarray(p_fused[k]), atol=1e-6)


def test_fused_optimizer_pure_bf16_state():
    """pure-bf16 mode (the reference's model.half() analog): params and
    moments stay bf16, updates are finite and move the weights."""
    from gaviko_tpu.train import fused_optim

    rng = np.random.RandomState(1)
    p = {"w": jnp.asarray(rng.randn(32, 16)).astype(jnp.bfloat16)}
    s = fused_optim.init(p)
    assert s.mu["w"].dtype == jnp.bfloat16
    g = {"w": jnp.asarray(rng.randn(32, 16)).astype(jnp.bfloat16)}
    p2, s2 = fused_optim.step(g, s, p, 3e-4, clip=1.0, eps=1e-4)
    assert p2["w"].dtype == jnp.bfloat16
    assert s2.mu["w"].dtype == jnp.bfloat16
    a, b = np.asarray(p["w"], np.float32), np.asarray(p2["w"], np.float32)
    assert np.isfinite(b).all() and (a != b).any()
    assert int(s2.count) == 1


def test_pallas_adam_leaf_matches_xla_leaf():
    """ops/fused_adam.adam_leaf (the one-pass big-leaf kernel) must be
    bit-identical to the XLA leaf path in fused_optim.step for both f32
    and pure-bf16 leaves, including the clip-scale rounding order."""
    from gaviko_tpu.ops.fused_adam import adam_leaf, adam_leaf_supported

    b1, b2, eps = 0.9, 0.999, 1e-8
    rng = np.random.RandomState(7)
    for dtype in (jnp.float32, jnp.bfloat16):
        shape = (512, 512)
        assert adam_leaf_supported(shape, dtype)
        g = jnp.asarray(rng.randn(*shape)).astype(dtype)
        m = jnp.asarray(0.1 * rng.randn(*shape)).astype(dtype)
        v = jnp.asarray(np.abs(0.01 * rng.randn(*shape))).astype(dtype)
        p = jnp.asarray(rng.randn(*shape)).astype(dtype)
        scale, lr, c1, c2 = 0.37, 3e-4, 0.1, 0.001999
        scalars = jnp.asarray([scale, lr, c1, c2], jnp.float32)
        po, mo, vo = adam_leaf(g, m, v, p, scalars, b1=b1, b2=b2, eps=eps)

        gs = g * jnp.asarray(scale, jnp.float32).astype(g.dtype)
        mr = b1 * m.astype(jnp.float32) + (1 - b1) * gs.astype(jnp.float32)
        vr = (b2 * v.astype(jnp.float32)
              + (1 - b2) * jnp.square(gs.astype(jnp.float32)))
        ur = (mr / c1) / (jnp.sqrt(vr / c2) + eps)
        pr = p - (lr * ur).astype(p.dtype)
        assert po.dtype == p.dtype and mo.dtype == p.dtype
        # FMA contraction differs between the Mosaic and XLA lowerings of
        # the same expressions (measured 1-2 f32 ULP); one bf16 ULP on top
        # of that for half-storage leaves.
        tol = 1e-6 if dtype == jnp.float32 else 1e-2
        np.testing.assert_allclose(np.asarray(po, np.float32),
                                   np.asarray(pr, np.float32), atol=tol)
        np.testing.assert_allclose(
            np.asarray(mo, np.float32),
            np.asarray(mr.astype(p.dtype), np.float32), atol=tol)
        np.testing.assert_allclose(
            np.asarray(vo, np.float32),
            np.asarray(vr.astype(p.dtype), np.float32), atol=tol)


def test_fused_optimizer_big_leaf_pallas_path(monkeypatch):
    """fused_optim.step with GAVIKO_PALLAS_ADAM=1 (the measured-off Pallas
    leaf variant) still matches the optax chain on kernel-eligible leaves."""
    import optax

    from gaviko_tpu.train import fused_optim

    monkeypatch.setenv("GAVIKO_PALLAS_ADAM", "1")

    rng = np.random.RandomState(3)
    params = {
        "big": jnp.asarray(rng.randn(2048, 128).astype(np.float32)),
        "small": jnp.asarray(rng.randn(9, 13).astype(np.float32)),
    }
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(learning_rate=0.01, eps=1e-8))
    o = tx.init(params)
    s = fused_optim.init(params)
    p_ref = p_fused = params
    for it in range(3):
        grads = {k: jnp.asarray(rng.randn(*v.shape).astype(np.float32))
                 * (10.0 if it % 2 else 0.01) for k, v in params.items()}
        u, o = tx.update(grads, o, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p_fused, s = fused_optim.step(grads, s, p_fused, 0.01, clip=1.0,
                                      eps=1e-8)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p_ref[k]), np.asarray(p_fused[k]), atol=1e-6)


def test_onecycle_beta1_matches_torch_momentum_cycle():
    """The beta1 schedule must reproduce torch OneCycleLR's momentum cycle
    (cycle_momentum=True default: beta1 overwritten every step, inverse-
    phased to the lr) value-for-value over a full 20-step cycle, for both
    a warmup-heavy and the reference pct_start."""
    import torch

    from gaviko_tpu.train.schedule import onecycle_beta1, onecycle_cos

    for pct_start in (0.3, 0.6):
        total = 20
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=1e-4, betas=(0.9, 0.999))
        sch = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=3e-4, total_steps=total, pct_start=pct_start,
            div_factor=10.0, final_div_factor=1000.0, anneal_strategy="cos",
            three_phase=False)
        want_b1, want_lr = [], []
        for _ in range(total):
            want_lr.append(opt.param_groups[0]["lr"])
            want_b1.append(opt.param_groups[0]["betas"][0])
            opt.step()
            sch.step()
        b1s = onecycle_beta1(total, pct_start=pct_start)
        lrs = onecycle_cos(3e-4, total, pct_start=pct_start, div_factor=10.0,
                           final_div_factor=1000.0)
        got_b1 = [float(b1s(i)) for i in range(total)]
        got_lr = [float(lrs(i)) for i in range(total)]
        np.testing.assert_allclose(got_b1, want_b1, atol=1e-6)
        np.testing.assert_allclose(got_lr, want_lr, rtol=1e-5)
