"""Loss functions: multi-class focal loss (reference-parity + corrected) and CE.

The reference focal loss (src/losses/focal_loss.py) has a parity-critical
defect: ``_process_preds`` is defined twice — the surviving definition
(84-91) clamps to [eps, 1-eps] then softmaxes — and ``forward`` applies it
TWICE (94 and 102), i.e. softmax(softmax(clamp(logits))). ``parity=True``
reproduces that exactly; ``parity=False`` is the corrected single
log-softmax formulation (recommended for new training runs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _process_preds(x: jax.Array, eps: float) -> jax.Array:
    """Ref focal_loss.py:84-91 (the second, surviving definition)."""
    x = jnp.clip(x, eps, 1.0 - eps)
    if x.shape[-1] == 1:  # binary branch
        return jax.nn.sigmoid(x)
    return jax.nn.softmax(x, axis=-1)


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    gamma: float,
    *,
    weights: Optional[jax.Array] = None,
    reduction: str = "mean",
    ignore_index: int = -100,
    eps: float = 1e-16,
    parity: bool = True,
) -> jax.Array:
    """Multi-class focal loss over [B, C] logits and int labels [B]."""
    if parity:
        x = _process_preds(logits, eps)   # focal_loss.py:94
        x = _process_preds(x, eps)        # focal_loss.py:102 (double apply)
        mask = labels == ignore_index
        safe_labels = jnp.where(mask, 0, labels)
        target = jax.nn.one_hot(safe_labels, x.shape[-1], dtype=x.dtype)
        pt = jnp.sum(target * x, axis=-1) * (~mask)
        nll = -jnp.log(eps + pt)
        nll = jnp.where(mask, 0.0, nll)
        w = jnp.ones_like(pt) if weights is None else jnp.sum(target * weights, axis=-1)
        loss = w * (1.0 - pt) ** gamma * nll
        if reduction == "mean":
            return loss.sum() / ((~mask) * w).sum()
        if reduction == "sum":
            return loss.sum()
        return loss
    # Corrected: single softmax, stable log-probs.
    mask = labels == ignore_index
    safe_labels = jnp.where(mask, 0, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    w = jnp.ones_like(pt) if weights is None else weights[safe_labels]
    loss = jnp.where(mask, 0.0, -w * (1.0 - pt) ** gamma * logpt)
    if reduction == "mean":
        return loss.sum() / ((~mask) * w).sum()
    if reduction == "sum":
        return loss.sum()
    return loss


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Mean CE over non-ignored rows (torch nn.CrossEntropyLoss defaults)."""
    mask = labels == ignore_index
    safe = jnp.where(mask, 0, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(mask, 0.0, nll)
    return nll.sum() / jnp.maximum((~mask).sum(), 1)


def make_criterion(train_cfg: dict):
    """loss_fn selection (ref: train.py:176-179; gamma=1.2 hardcoded there)."""
    if train_cfg.get("loss_fn") == "focal_loss":
        parity = train_cfg.get("focal_parity", True)
        return lambda logits, labels: focal_loss(logits, labels, gamma=1.2, parity=parity)
    return cross_entropy_loss
