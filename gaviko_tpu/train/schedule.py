"""OneCycleLR schedule matching torch.optim.lr_scheduler.OneCycleLR.

The reference drives Adam with a per-step OneCycleLR (ref: train.py:197-206):
cosine anneal, two phases (three_phase=False), initial_lr = max_lr/div_factor,
min_lr = initial_lr/final_div_factor, warmup length = pct_start*total_steps.
optax calls the schedule with the number of completed updates, which matches
torch's ``last_epoch`` counter at each optimizer.step().

MOMENTUM CYCLING: torch's OneCycleLR defaults ``cycle_momentum=True``, and
for an optimizer with ``betas`` (Adam) it OVERWRITES beta1 every step with
the inverse-phased cosine cycle max_momentum(0.95) -> base_momentum(0.85)
-> max_momentum; Adam's bias correction then uses the CURRENT beta1^t.
The reference never opts out, so every reference training run cycles
Adam's beta1 (found by the 3-step GAViKO train oracle: fixed beta1=0.9
diverged 5e-5/step from torch; the cycle reproduces torch to 1e-7).
:func:`beta1_from_config` + :func:`scale_by_cycled_adam` implement those
exact semantics; ``scheduler.cycle_momentum: false`` opts out.
"""

from __future__ import annotations

import jax
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


def onecycle_beta1(
    total_steps: int,
    pct_start: float = 0.3,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
):
    """torch OneCycleLR's momentum cycle for Adam's beta1: same two-phase
    cosine structure as the lr, inverse-phased — max_momentum at the ends,
    base_momentum at the lr peak (torch OneCycleLR._schedule_phases +
    use_beta1)."""
    up_steps = float(pct_start * total_steps) - 1.0
    down_steps = float(total_steps - up_steps - 1.0)

    def _anneal(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        c = jnp.minimum(jnp.asarray(count, jnp.float32), total_steps - 1.0)
        pct_up = jnp.where(up_steps > 0, c / jnp.maximum(up_steps, 1e-9), 1.0)
        pct_dn = jnp.clip((c - up_steps) / jnp.maximum(down_steps, 1e-9), 0.0, 1.0)
        m_up = _anneal(max_momentum, base_momentum, jnp.clip(pct_up, 0.0, 1.0))
        m_dn = _anneal(base_momentum, max_momentum, pct_dn)
        return jnp.where(c <= up_steps, m_up, m_dn)

    return schedule


def scale_by_cycled_adam(b1_sched, b2: float = 0.999, eps: float = 1e-8):
    """Adam moment scaling with a PER-STEP beta1, matching torch's
    Adam-under-OneCycleLR semantics exactly: the step's moment update AND
    the bias-correction power 1 - beta1^t both use the beta1 the scheduler
    installed for that step. State layout reuses optax's ScaleByAdamState
    (count, mu, nu), so resume-state flattening is unchanged vs
    optax.adam."""
    import optax

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=z,
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        b1 = b1_sched(state.count).astype(jnp.float32)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(jnp.float32)
                          + (1.0 - b1) * g.astype(jnp.float32)).astype(g.dtype),
            state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: (b2 * v.astype(jnp.float32)
                          + (1.0 - b2) * jnp.square(g.astype(jnp.float32))
                          ).astype(g.dtype),
            state.nu, updates)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        out = jax.tree.map(
            lambda m, v: ((m.astype(jnp.float32) / c1)
                          / (jnp.sqrt(v.astype(jnp.float32) / c2) + eps)
                          ).astype(m.dtype),
            mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def beta1_from_config(sch_cfg: dict, total_steps: int):
    """The beta1 cycle the reference's scheduler applies, or None when
    ``scheduler.cycle_momentum: false`` opts out (fixed beta1=0.9)."""
    if not sch_cfg.get("cycle_momentum", True):
        return None
    return onecycle_beta1(
        total_steps=total_steps,
        pct_start=sch_cfg.get("pct_start", 0.3),
        base_momentum=sch_cfg.get("base_momentum", 0.85),
        max_momentum=sch_cfg.get("max_momentum", 0.95),
    )


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
