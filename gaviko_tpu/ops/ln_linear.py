"""Pallas fused LayerNorm + Linear: h = LN(x) @ W_t (+ b) in one kernel.

The reference computes nn.LayerNorm then the qkv Linear as separate modules
(ref: src/model/vision_transformer.py:55-58, 86-90); on TPU that costs a
full HBM round-trip of the normalized activations per layer. Here the
normalization happens in VMEM on the row block feeding the MXU — the same
pattern as ops/fused_mlp.py's LN+fc1 half, exposed standalone so the
attention block's qkv projection gets it too.

Forward-only fusion with a rematerialized XLA VJP (custom_vjp), matching the
other fused ops' contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaviko_tpu.ops._blocks import row_block


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_LIMIT = 100 * 1024 * 1024
# Weight budget: vit-b16's 3.5 MB qkv weight wins (+3% at B32 eval) but
# vit-l16's 6.3 MB loses ~8% (GAViKO B8: 175.0 vol/s unfused vs 160.9
# fused) — shallow row-block pipelines amortize big resident weights
# poorly. Gate to vit-b16-and-smaller.
_WEIGHT_BUDGET = 4_000_000


def ln_linear_supported(dim: int, out_dim: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    return (
        dim % 128 == 0
        and out_dim % 128 == 0
        and dim * out_dim * itemsize <= _WEIGHT_BUDGET
    )


def ln_linear_hybrid_supported(dim: int, out_dim: int, dtype) -> bool:
    """Gate for ``ln_linear_hybrid`` = the Pallas BACKWARD's VMEM fit
    (weights + f32 dW accumulator resident)."""
    itemsize = jnp.dtype(dtype).itemsize
    return (
        dim % 128 == 0
        and out_dim % 128 == 0
        and dim * out_dim * (itemsize + 4) <= 45_000_000
    )


def _ln_linear_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)
    h = h * g_ref[:] + b_ref[:]
    # w stays in the torch (out, in) layout — the MXU contracts transposed
    # operands natively, so no (out, in) -> (in, out) copy ever materializes
    # (those copies re-run EVERY training step once params update).
    o_ref[:] = jax.lax.dot_general(
        h, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_ln_linear(x, gamma, beta, w, eps: float = 1e-5):
    """x: [B, N, dim]; w: (out, dim) TORCH layout -> LN(x) @ w.T."""
    return _ln_linear_forward(x, gamma, beta, w, eps)


def _ln_linear_forward(x, gamma, beta, w, eps):
    B, N, dim = x.shape
    out_dim = w.shape[0]
    rows = B * N
    block = row_block(rows, "GAVIKO_LNL_BLOCK")
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, dim)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
    out = pl.pallas_call(
        functools.partial(_ln_linear_kernel, eps=eps),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dim, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(xf, gamma.reshape(1, dim), beta.reshape(1, dim), w)
    return out[:rows].reshape(B, N, out_dim)


def ln_linear_reference(x, gamma, beta, w, eps=1e-5):
    """Pure-XLA twin (torch-layout w); backs the VJP and the CPU tests."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    h = h * gamma + beta
    return jnp.einsum("bnd,kd->bnk", h, w,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _ln_linear_fwd(x, gamma, beta, w, eps):
    return _ln_linear_forward(x, gamma, beta, w, eps), (x, gamma, beta, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ln_linear_hybrid(x, gamma, beta, w, eps: float = 1e-5):
    """LN + Linear with an XLA forward and the Pallas row-blocked backward.

    The TRAIN-path variant: XLA's forward fusion of LN into the qkv GEMM is
    already optimal (the fully fused forward kernel measured -4% on the train
    step, see ARCHITECTURE.md), but its backward materializes the f32
    (rows, dim) dh cotangent and defers the dgamma/dbeta ROW-REDUCTIONS into
    the optimizer-phase fusions (~3 ms/step at vit-b16 B8). This wrapper
    keeps the XLA forward and routes the backward through
    ``_ln_linear_bwd_kernel``, which accumulates dW/dgamma/dbeta in VMEM
    scratch while the cotangent block is resident."""
    return ln_linear_reference(x, gamma, beta, w, eps)


def _ln_linear_hybrid_fwd(x, gamma, beta, w, eps):
    return ln_linear_reference(x, gamma, beta, w, eps), (x, gamma, beta, w)


def _ln_linear_bwd_kernel(x_ref, g_ref, b_ref, w_ref, dy_ref,
                          dx_ref, dg_ref, db_ref, dw_ref,
                          dw_acc, dg_acc, db_acc, *, eps):
    """Row-blocked LN+Linear backward; LN recomputed in VMEM, weight/LN
    grads accumulated in f32 scratch across the sequential row grid."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    h = xhat.astype(x_ref.dtype) * g_ref[:] + b_ref[:]
    dy = dy_ref[:]
    dw = jax.lax.dot_general(  # (out, dim) = dy^T @ h
        dy, h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jax.lax.dot_general(  # (block, dim) = dy @ w
        dy, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgamma = jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw_acc[:] = dw
        dg_acc[:] = dgamma
        db_acc[:] = dbeta

    @pl.when(i > 0)
    def _():
        dw_acc[:] = dw_acc[:] + dw
        dg_acc[:] = dg_acc[:] + dgamma
        db_acc[:] = db_acc[:] + dbeta

    @pl.when(i == ni - 1)
    def _():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        dg_ref[:] = dg_acc[:].astype(dg_ref.dtype)
        db_ref[:] = db_acc[:].astype(db_ref.dtype)


def _ln_linear_bwd(eps, res, g):
    x, gamma, beta, w = res
    B, N, dim = x.shape
    out_dim = w.shape[0]
    # Single source of truth for the VMEM-fit gate: the hybrid path claims
    # support via ln_linear_hybrid_supported, so the backward must use the
    # SAME predicate or a budget retune would silently split them (kernel
    # forward + XLA backward, quietly losing the measured win).
    if not ln_linear_hybrid_supported(dim, out_dim, x.dtype):
        _, vjp = jax.vjp(
            lambda x, gamma, beta, w: ln_linear_reference(x, gamma, beta, w,
                                                          eps),
            x, gamma, beta, w,
        )
        return vjp(g)
    rows = B * N
    block = row_block(rows, "GAVIKO_LNL_BLOCK")
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, dim)
    gf = g.reshape(rows, out_dim)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
        gf = jnp.pad(gf, [(0, n_pad - rows), (0, 0)])
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    dx, dgamma, dbeta, dw = pl.pallas_call(
        functools.partial(_ln_linear_bwd_kernel, eps=eps),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(1, dim), full(1, dim), full(out_dim, dim),
            pl.BlockSpec((block, out_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(1, dim), full(1, dim), full(out_dim, dim),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, dim), x.dtype),
            jax.ShapeDtypeStruct((1, dim), gamma.dtype),
            jax.ShapeDtypeStruct((1, dim), beta.dtype),
            jax.ShapeDtypeStruct((out_dim, dim), w.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((out_dim, dim), jnp.float32),
            pltpu.VMEM((1, dim), jnp.float32),
            pltpu.VMEM((1, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(xf, gamma.reshape(1, dim), beta.reshape(1, dim), w, gf)
    return (
        dx[:rows].reshape(B, N, dim),
        dgamma.reshape(gamma.shape),
        dbeta.reshape(beta.shape),
        dw,
    )


fused_ln_linear.defvjp(_ln_linear_fwd, _ln_linear_bwd)
ln_linear_hybrid.defvjp(_ln_linear_hybrid_fwd, _ln_linear_bwd)
