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
