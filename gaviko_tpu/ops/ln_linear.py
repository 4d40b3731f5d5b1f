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


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_LIMIT = 100 * 1024 * 1024
# Weight-pair budget: full W resident per program (v5e: 128 MB VMEM behind a
# 32 MB default limit; see ARCHITECTURE.md).
_WEIGHT_BUDGET = 40_000_000


def ln_linear_supported(dim: int, out_dim: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    return (
        dim % 128 == 0
        and out_dim % 128 == 0
        and dim * out_dim * itemsize <= _WEIGHT_BUDGET
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
    block = 256
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


def _ln_linear_bwd(eps, res, g):
    x, gamma, beta, w = res
    _, vjp = jax.vjp(
        lambda x, gamma, beta, w: ln_linear_reference(x, gamma, beta, w, eps),
        x, gamma, beta, w,
    )
    return vjp(g)


fused_ln_linear.defvjp(_ln_linear_fwd, _ln_linear_bwd)
