"""Mesh-parallel (DP x TP) inference: sharded forward for serving/eval.

Reuses the training-side partition rules (parallel/mesh.py): Megatron-style
head/hidden TP over the torch-layout weights, batch sharded over ``data``.
The reference's only multi-GPU story is DeepSpeed ZeRO for TRAINING
(src/configs/deepspeed.yaml); it has no parallel inference at all — this is
the TPU-native extension: one jitted forward whose GSPMD shardings put
activations on the mesh, with XLA inserting the collectives.

Single-chip behavior is unchanged (serving only builds a mesh when asked).
Validated on the virtual 8-device CPU mesh (tests/test_parallel_infer.py):
DP2xTP4 logits match the single-device forward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gaviko_tpu.parallel.mesh import make_mesh, shardings_for_params


def make_parallel_forward(model, mesh, params, compute_dtype=None):
    """-> (jitted forward(params, inputs) -> f32 logits, sharded_params).

    ``params`` are placed onto the mesh according to the TP rules (weights
    whose dims don't divide fall back to replication); inputs are sharded
    over the ``data`` axis; logits come back replicated.
    """
    p_sh = shardings_for_params(params, mesh, tp=mesh.shape["model"] > 1)
    sharded = {
        k: jax.device_put(v, p_sh[k]) for k, v in params.items()
    }
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def _fwd(prm, inputs):
        if compute_dtype is not None:
            prm = jax.tree.map(
                lambda t: t.astype(compute_dtype)
                if t.dtype == jnp.float32 else t, prm)
            inputs = inputs.astype(compute_dtype)
        return model.apply(prm, inputs, model.spec).astype(jnp.float32)

    fwd = jax.jit(
        _fwd,
        in_shardings=({k: p_sh[k] for k in params}, batch_sh),
        out_shardings=rep,
    )
    return fwd, sharded


def parallel_predictor_fn(model, params, data: int, tp: int,
                          compute_dtype=None, devices=None):
    """Convenience wrapper used by serving: builds the mesh and returns
    (forward, sharded_params, mesh). ``data * tp`` must not exceed the
    available device count."""
    mesh = make_mesh(data=data, model=tp, devices=devices)
    fwd, sharded = make_parallel_forward(model, mesh, params, compute_dtype)
    return fwd, sharded, mesh
