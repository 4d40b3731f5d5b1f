"""Pallas one-pass Adam leaf update: (g, mu, nu, p) -> (p', mu', nu').

The XLA lowering of the fused optimizer's per-leaf chain
(train/fused_optim.py) SPLITS each leaf into two fusions (observed on the
round-3 device trace: 140 fusions at fused_optim.py:82 + 140 at :84), each
re-reading g/mu/nu — ~10-11 HBM arrays per leaf against the irreducible
7 (read g/mu/nu/p, write mu'/nu'/p'). This kernel does the identical math
(ref: torch.optim.Adam + clip_grad_norm_, src/train.py:185-206) in ONE
pass per leaf at the 7-array floor. Engaged for large 2D-able leaves only;
small leaves stay on the XLA path where launch overhead dwarfs traffic.

Scalars that change per step (clip scale, lr, bias corrections) arrive as
a (4,) f32 SMEM operand so the kernel is step-invariant and compiles once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _adam_leaf_kernel(s_ref, g_ref, m_ref, v_ref, p_ref,
                      po_ref, mo_ref, vo_ref, *, b1, b2, eps):
    scale = s_ref[0]
    lr = s_ref[1]
    c1 = s_ref[2]
    c2 = s_ref[3]
    # Clip-scale multiplies in the GRAD dtype (then extends) to match the
    # XLA leaf path's rounding order (fused_optim.leaf:
    # g * scale.astype(g.dtype)); residual deltas vs that path are 1-2 f32
    # ULP of FMA-contraction difference (regression-tested).
    g = (g_ref[:] * scale.astype(g_ref.dtype)).astype(jnp.float32)
    m = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
    update = (m / c1) / (jnp.sqrt(v / c2) + eps)
    po_ref[:] = p_ref[:] - (lr * update).astype(po_ref.dtype)
    mo_ref[:] = m.astype(mo_ref.dtype)
    vo_ref[:] = v.astype(vo_ref.dtype)


def adam_leaf_supported(shape, dtype) -> bool:
    """2D-able leaves with a 128-multiple last dim and enough rows that
    HBM traffic (not launch overhead) dominates."""
    if len(shape) < 2:
        return False
    rows = 1
    for d in shape[:-1]:
        rows *= d
    cols = shape[-1]
    return cols % 128 == 0 and rows * cols >= 262144


def adam_leaf(g, m, v, p, scalars, *, b1: float, b2: float, eps: float):
    """One-pass Adam update for one leaf.

    ``scalars``: (4,) f32 = [clip_scale, lr, 1-b1^t, 1-b2^t].
    Returns (p', m', v') with the leaves' storage dtype (pure-bf16 mode
    keeps moments bf16, mirroring the reference's model.half() Adam).
    """
    shape = p.shape
    rows = 1
    for d in shape[:-1]:
        rows *= d
    cols = shape[-1]
    g2 = g.reshape(rows, cols)
    m2 = m.reshape(rows, cols)
    v2 = v.reshape(rows, cols)
    p2 = p.reshape(rows, cols)
    # Row blocks sized so 7 live (block, cols) buffers (f32 temporaries)
    # stay within the raised Mosaic scoped-vmem limit; ceil-pad handles
    # odd row counts (e.g. the (1001, 768) positional embedding).
    block = min(rows, max(8, 12_000_000 // (cols * 4 * 7) // 8 * 8))
    n_pad = ((rows + block - 1) // block) * block
    if n_pad != rows:
        pad = [(0, n_pad - rows), (0, 0)]
        g2, m2, v2, p2 = (jnp.pad(t, pad) for t in (g2, m2, v2, p2))
    vec = pl.BlockSpec((block, cols), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    po, mo, vo = pl.pallas_call(
        functools.partial(_adam_leaf_kernel, b1=b1, b2=b2, eps=eps),
        grid=(n_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vec, vec, vec, vec],
        out_specs=(vec, vec, vec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, cols), p.dtype) for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_use_interpret(),
    )(scalars, g2, m2, v2, p2)
    if n_pad != rows:
        po, mo, vo = po[:rows], mo[:rows], vo[:rows]
    return po.reshape(shape), mo.reshape(shape), vo.reshape(shape)
