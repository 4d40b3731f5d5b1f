"""Pallas fused transformer MLP: LN -> fc1 -> GELU -> fc2 in one kernel.

XLA materializes the (tokens, mlp_dim) hidden activation in HBM between fc1
and fc2 (~400 MB round trip per vit-b16 layer at batch 32). This kernel
keeps both weight matrices resident in VMEM and streams row blocks, so the
hidden exists only as a VMEM block.

Weights are passed in natural (in, out) layout (transposed from the torch
(out, in) storage by the caller — a trivial 5 MB copy that XLA hoists).
Forward-only fusion: training with inner dropout uses the unfused path; the
backward is a rematerialized XLA VJP (custom_vjp), matching the other fused
ops' contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                acc_ref, *, eps, approximate):
    """Grid = (row_blocks, mlp_chunks). The hidden dim streams in chunks so
    weight slices fit VMEM even for vit-l16 (dim 1024, mlp 4096); partial
    fc2 products accumulate in an f32 scratch, written out on the last
    chunk. LN is recomputed per chunk (cheap relative to the GEMMs)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)
    h = h * g_ref[:] + b_ref[:]
    h = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=approximate).astype(o_ref.dtype)
    part = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part + b2_ref[:].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


_WEIGHT_VMEM_BUDGET = 11_000_000


def _chunk_plan(dim: int, mlp_dim: int, itemsize: int):
    """-> chunk size (divisor of mlp_dim, multiple of 128) fitting VMEM."""
    chunk = mlp_dim
    while 2 * dim * chunk * itemsize > _WEIGHT_VMEM_BUDGET:
        if chunk % 2 or (chunk // 2) % 128:
            return None
        chunk //= 2
    return chunk


def fused_mlp_supported(dim: int, mlp_dim: int, dtype) -> bool:
    # Chunked accumulation (weights > VMEM, e.g. vit-l16) measured SLOWER
    # than XLA's unfused path end-to-end, so fusion is only claimed when the
    # full weight pair fits (nj == 1).
    itemsize = jnp.dtype(dtype).itemsize
    return (
        dim % 128 == 0 and mlp_dim % 128 == 0
        and _chunk_plan(dim, mlp_dim, itemsize) == mlp_dim
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp(x, gamma, beta, w1, b1, w2, b2, eps: float, approximate: bool):
    """x: [B, N, dim]; w1: (dim, mlp), w2: (mlp, dim) natural layout."""
    return _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, eps, approximate)


def _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, eps, approximate):
    B, N, dim = x.shape
    mlp_dim = w1.shape[1]
    rows = B * N
    block = 256
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, dim)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
    chunk = _chunk_plan(dim, mlp_dim, jnp.dtype(x.dtype).itemsize)
    nj = mlp_dim // chunk
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, approximate=approximate),
        grid=(n_pad // block, nj),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, dim), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((block, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(xf, gamma.reshape(1, dim), beta.reshape(1, dim), w1,
      b1.reshape(1, mlp_dim), w2, b2.reshape(1, dim))
    return out[:rows].reshape(B, N, dim)


def _fused_mlp_fwd(x, gamma, beta, w1, b1, w2, b2, eps, approximate):
    return (
        _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, eps, approximate),
        (x, gamma, beta, w1, b1, w2, b2),
    )


def _fused_mlp_bwd(eps, approximate, res, g):
    x, gamma, beta, w1, b1, w2, b2 = res

    def ref(x, gamma, beta, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        h = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        h = h * gamma + beta
        h = (h @ w1 + b1.astype(jnp.float32)).astype(x.dtype)
        h = jax.nn.gelu(h, approximate=approximate)
        return (h @ w2 + b2.astype(jnp.float32)).astype(x.dtype)

    _, vjp = jax.vjp(ref, x, gamma, beta, w1, b1, w2, b2)
    return vjp(g)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
