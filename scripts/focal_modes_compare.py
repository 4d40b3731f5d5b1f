"""Focal-loss parity-mode vs corrected-mode convergence comparison (ROADMAP #7).

The reference's focal loss double-applies softmax (src/losses/focal_loss.py:94,102
— see PARITY.md), which compresses logits into a near-uniform simplex point and
shrinks gradients by orders of magnitude. ``focal_parity: true`` reproduces that
for parity; ``focal_parity: false`` is the corrected single log-softmax form.
This script trains the same tiny classifier under both modes on a synthetic
5-class task (same init, same data, same Adam 3e-4 as the reference) and writes
per-epoch train loss / val accuracy to ``docs_focal_modes.csv`` so the config
default can be chosen on evidence.

Run: JAX_PLATFORMS=cpu python scripts/focal_modes_compare.py
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# This environment's sitecustomize force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS; pin CPU after import (same trick as tests/conftest).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from gaviko_tpu.train.losses import focal_loss

CLASSES = 5
DIM = 24
HID = 64
EPOCHS = 40
BATCH = 32
LR = 3e-4  # the reference's Adam lr (train.py:185)


def make_data(rng: np.random.RandomState, centers: np.ndarray, n: int):
    """5 Gaussian clusters with overlap: hard enough that acc tracks loss."""
    y = rng.randint(0, CLASSES, size=n)
    x = centers[y] + rng.randn(n, DIM) * 1.4
    return x.astype(np.float32), y.astype(np.int32)


def init_params(key):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (DIM, HID)) * (1.0 / np.sqrt(DIM)),
        "b1": jnp.zeros((HID,)),
        "w2": jax.random.normal(k2, (HID, CLASSES)) * (1.0 / np.sqrt(HID)),
        "b2": jnp.zeros((CLASSES,)),
    }


def apply(params, x):
    h = jax.nn.gelu(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def run_mode(parity: bool, data):
    xtr, ytr, xva, yva = data
    params = init_params(jax.random.PRNGKey(0))
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return focal_loss(apply(p, xb), yb, gamma=1.2, parity=parity)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_acc(params):
        return (jnp.argmax(apply(params, xva), -1) == yva).mean()

    rows = []
    n = xtr.shape[0]
    order_rng = np.random.RandomState(1)
    for epoch in range(1, EPOCHS + 1):
        order = order_rng.permutation(n)
        losses = []
        for i in range(0, n, BATCH):
            idx = order[i : i + BATCH]
            params, opt_state, loss = step(params, opt_state, xtr[idx], ytr[idx])
            losses.append(float(loss))
        rows.append({
            "mode": "parity" if parity else "corrected",
            "epoch": epoch,
            "train_loss": round(float(np.mean(losses)), 5),
            "val_acc": round(float(val_acc(params)), 4),
        })
    return rows


def main():
    rng = np.random.RandomState(42)
    centers = rng.randn(CLASSES, DIM) * 1.2
    xtr, ytr = make_data(rng, centers, 640)
    xva, yva = make_data(rng, centers, 320)
    data = (jnp.asarray(xtr), jnp.asarray(ytr), jnp.asarray(xva), jnp.asarray(yva))

    all_rows = run_mode(True, data) + run_mode(False, data)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs_focal_modes.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["mode", "epoch", "train_loss", "val_acc"])
        w.writeheader()
        w.writerows(all_rows)

    for mode in ("parity", "corrected"):
        rs = [r for r in all_rows if r["mode"] == mode]
        first = next((r["epoch"] for r in rs if r["val_acc"] >= 0.60), None)
        print(f"{mode:>9}: final loss {rs[-1]['train_loss']:.4f}, "
              f"final val_acc {rs[-1]['val_acc']:.3f}, "
              f"epochs to 60% acc: {first}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
