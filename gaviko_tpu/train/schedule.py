"""OneCycleLR schedule matching torch.optim.lr_scheduler.OneCycleLR.

The reference drives Adam with a per-step OneCycleLR (ref: train.py:197-206):
cosine anneal, two phases (three_phase=False), initial_lr = max_lr/div_factor,
min_lr = initial_lr/final_div_factor, warmup length = pct_start*total_steps.
optax calls the schedule with the number of completed updates, which matches
torch's ``last_epoch`` counter at each optimizer.step().
"""

from __future__ import annotations

import jax.numpy as jnp


def onecycle_cos(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase boundaries (OneCycleLR._schedule_phases).
    up_steps = float(pct_start * total_steps) - 1.0
    down_steps = float(total_steps - up_steps - 1.0)

    def _anneal(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        c = jnp.minimum(jnp.asarray(count, jnp.float32), total_steps - 1.0)
        pct_up = jnp.where(up_steps > 0, c / jnp.maximum(up_steps, 1e-9), 1.0)
        pct_dn = jnp.clip((c - up_steps) / jnp.maximum(down_steps, 1e-9), 0.0, 1.0)
        lr_up = _anneal(initial_lr, max_lr, jnp.clip(pct_up, 0.0, 1.0))
        lr_dn = _anneal(max_lr, min_lr, pct_dn)
        return jnp.where(c <= up_steps, lr_up, lr_dn)

    return schedule


def onecycle_cos_host(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """Pure-python twin of onecycle_cos for host-side logging (avoids a
    device round trip per step)."""
    import math

    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = float(pct_start * total_steps) - 1.0
    down_steps = float(total_steps - up_steps - 1.0)

    def _anneal(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + math.cos(math.pi * pct))

    def schedule(count: int) -> float:
        c = min(float(count), total_steps - 1.0)
        if c <= up_steps:
            pct = min(max(c / max(up_steps, 1e-9), 0.0), 1.0)
            return _anneal(initial_lr, max_lr, pct)
        pct = min(max((c - up_steps) / max(down_steps, 1e-9), 0.0), 1.0)
        return _anneal(max_lr, min_lr, pct)

    return schedule


def from_config(sch_cfg: dict, total_steps: int):
    assert sch_cfg.get("anneal_strategy", "cos") == "cos", "only cos supported"
    assert not sch_cfg.get("three_phase", False), "three_phase not supported"
    return onecycle_cos(
        max_lr=sch_cfg["max_lr"],
        total_steps=total_steps,
        pct_start=sch_cfg.get("pct_start", 0.3),
        div_factor=sch_cfg.get("div_factor", 25.0),
        final_div_factor=sch_cfg.get("final_div_factor", 1e4),
    )
