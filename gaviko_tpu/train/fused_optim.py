"""One-pass fused Adam + global-norm clip + parameter apply.

``optax.chain(clip_by_global_norm, adam)`` + ``apply_updates`` walks the
gradient tree in five stages, materializing three full-size intermediates
(clipped grads, adam updates, new params) in HBM — measured ~8 ms of a
51 ms vit-b16 B8 train step on v5e. This module computes the SAME math
(ref: torch.optim.Adam + clip_grad_norm_, src/train.py:185-206, 315-316;
optax-equivalent formulas, matching to float rounding) in two phases:

1. one reduction pass for the global grad norm;
2. one fused elementwise pass per leaf updating (mu, nu, param) together —
   XLA fuses each leaf's whole chain into a single kernel, so HBM traffic
   drops to the irreducible 7-array floor (read g/mu/nu/p, write
   mu'/nu'/p').

State layout is ``FusedAdamState(count, mu, nu)`` — NOT interchangeable
with the optax chain's nested state; resume checkpoints are compatible
within a configuration, not across a fused<->optax switch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class FusedAdamState(NamedTuple):
    count: jax.Array  # int32 scalar, number of completed steps
    mu: dict
    nu: dict


def init(params) -> FusedAdamState:
    zeros = lambda t: jnp.zeros_like(t)  # noqa: E731
    return FusedAdamState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
    )


def step(
    grads,
    state: FusedAdamState,
    params,
    sched: Callable[[jax.Array], jax.Array] | float,
    clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """-> (new_params, new_state). Semantics mirror
    optax.chain(clip_by_global_norm(clip), adam(sched, eps)) + apply_updates:
    the LR schedule is evaluated at the PRE-increment count (0-based first
    step) and Adam bias correction at the post-increment count, exactly as
    the optax chain's two inner counters do.

    ``b1`` may be a SCHEDULE (callable of the pre-increment count): torch's
    OneCycleLR cycles Adam's beta1 every step and the bias-correction power
    uses the step's current beta1 — see train/schedule.py."""
    # Phase 1: global norm (one read pass; XLA fuses square+reduce per leaf).
    gn = jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree.leaves(grads)
    ))
    scale = jnp.where(gn < clip, 1.0, clip / gn)

    lr = sched(state.count) if callable(sched) else jnp.asarray(sched)
    b1_cycled = callable(b1)
    if b1_cycled:
        b1 = b1(state.count).astype(jnp.float32)
    count = state.count + 1
    cf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** cf
    c2 = 1.0 - b2 ** cf

    def leaf(g, m, v, p):
        g = g * scale.astype(g.dtype)
        m = (b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32))
        v = (b2 * v.astype(jnp.float32)
             + (1.0 - b2) * jnp.square(g.astype(jnp.float32)))
        update = (m / c1) / (jnp.sqrt(v / c2) + eps)
        # Moments/params keep their storage dtype (bf16 in pure-half mode,
        # mirroring the reference's model.half() Adam, train.py:157-189);
        # the arithmetic above runs in f32 registers either way.
        return (
            p - (lr * update).astype(p.dtype),
            m.astype(p.dtype),
            v.astype(p.dtype),
        )

    # MEASURED OFF (default): XLA splits the per-leaf chain above into TWO
    # fusions that re-read g/mu/nu (~10-11 HBM arrays vs the 7-array floor,
    # round-3 device trace), so a one-pass Pallas leaf kernel
    # (ops/fused_adam.py) looked like ~0.5 ms of win — but on chip it
    # REGRESSED the vit-b16 B8 step 45.8 -> 46.9 ms: the split XLA fusions
    # overlap with neighboring work better than 48 serialized pallas_calls.
    # Kept behind GAVIKO_PALLAS_ADAM=1 as the documented rejected variant.
    import os
    # (The rejected pallas leaf kernel bakes b1 in as a static constant, so
    # it is incompatible with the cycled-beta1 schedule.)
    use_pallas = (os.environ.get("GAVIKO_PALLAS_ADAM", "0") == "1"
                  and not b1_cycled)
    if use_pallas:
        from gaviko_tpu.ops.fused_adam import adam_leaf, adam_leaf_supported
        scalars = jnp.stack([
            scale.astype(jnp.float32), jnp.asarray(lr, jnp.float32), c1, c2,
        ])

    # Params are flat dict[str, Array] throughout the framework.
    new_p, new_m, new_v = {}, {}, {}
    for k in grads:
        if use_pallas and adam_leaf_supported(params[k].shape,
                                              params[k].dtype):
            new_p[k], new_m[k], new_v[k] = adam_leaf(
                grads[k], state.mu[k], state.nu[k], params[k], scalars,
                b1=b1, b2=b2, eps=eps)
        else:
            new_p[k], new_m[k], new_v[k] = leaf(
                grads[k], state.mu[k], state.nu[k], params[k]
            )
    return new_p, FusedAdamState(count=count, mu=new_m, nu=new_v)
