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

from gaviko_tpu.ops.hash_dropout import apply_dropout


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def erf_f32(x):
    """float32 erf via Abramowitz & Stegun 7.1.26 (max abs err ~2.5e-6 in f32).

    Mosaic cannot lower lax.erf/lax.erfc inside TPU kernels (this jax
    version's jax.nn.gelu(approximate=False) emits erfc), so exact-GELU
    kernels spell erf with this exp-based rational approximation. The 2.5e-6
    error is ~2 decades below the framework's 1e-4 logit-parity budget.
    """
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def gelu_exact_f32(x):
    """Exact (erf-form) GELU on f32 inputs, safe inside Pallas TPU kernels."""
    return x * 0.5 * (1.0 + erf_f32(x * 0.7071067811865476))


def _mlp_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, acc_ref, *, eps, approximate, dropout_rate, residual):
    """Grid = (row_blocks, mlp_chunks). The hidden dim streams in chunks so
    weight slices fit VMEM even for vit-l16 (dim 1024, mlp 4096); partial
    fc2 products accumulate in an f32 scratch, written out on the last
    chunk. LN is recomputed per chunk (cheap relative to the GEMMs).

    Training dropout (ref FeedForward: LN->fc1->GELU->Drop->fc2->Drop,
    vision_transformer.py:26-38) replays hash bits addressed by (global flat
    row, feature column): salt 0 for the hidden site, salt 1 for the output
    site — the XLA backward reconstructs identical masks."""
    i, j = pl.program_id(0), pl.program_id(1)
    nj = pl.num_programs(1)
    block = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)
    h = h * g_ref[:] + b_ref[:]
    h = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    if approximate:
        h = jax.nn.gelu(h, approximate=True)
    else:
        h = gelu_exact_f32(h)
    if dropout_rate > 0.0:
        h = apply_dropout(h, seed_ref[0], dropout_rate, salt=0,
                          row_offset=i * block,
                          col_offset=j * w1_ref.shape[1])
    h = h.astype(o_ref.dtype)
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
        out = acc_ref[:]
        if dropout_rate > 0.0:
            out = apply_dropout(out, seed_ref[0], dropout_rate, salt=1,
                                row_offset=i * block)
        if residual:
            # The caller's `branch + x` residual fused in (the x block is
            # already resident); saves one 3-tensor HBM pass per layer.
            out = out + x_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_mlp(x, gamma, beta, w1, b1, w2, b2, seed, eps: float,
              approximate: bool, dropout_rate: float = 0.0,
              residual: bool = False):
    """x: [B, N, dim]; w1: (dim, mlp), w2: (mlp, dim) natural layout.
    ``seed``: (1,) int32 hash-dropout seed (ignored when dropout_rate == 0).
    ``residual=True`` returns x + branch instead of the branch alone."""
    return _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps,
                              approximate, dropout_rate, residual)


def _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
                       dropout_rate, residual=False):
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
        functools.partial(_mlp_kernel, eps=eps, approximate=approximate,
                          dropout_rate=dropout_rate, residual=residual),
        grid=(n_pad // block, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(seed, xf, gamma.reshape(1, dim), beta.reshape(1, dim), w1,
      b1.reshape(1, mlp_dim), w2, b2.reshape(1, dim))
    return out[:rows].reshape(B, N, dim)


def _fused_mlp_fwd(x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
                   dropout_rate, residual):
    return (
        _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps,
                           approximate, dropout_rate, residual),
        (x, gamma, beta, w1, b1, w2, b2, seed),
    )


def mlp_reference(x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
                  dropout_rate=0.0, residual=False):
    """Pure-XLA forward matching the kernel (same hash masks under dropout);
    backs the rematerialized VJP and the CPU equivalence tests."""
    from gaviko_tpu.ops.hash_dropout import keep_mask

    B, N, dim = x.shape
    mlp_dim = w1.shape[1]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    h = h * gamma + beta
    h = (h @ w1 + b1.astype(jnp.float32))
    h = jax.nn.gelu(h, approximate=True) if approximate else gelu_exact_f32(h)
    if dropout_rate > 0.0:
        inv = 1.0 / (1.0 - dropout_rate)
        keep_h = keep_mask((B * N, mlp_dim), seed[0], dropout_rate,
                           salt=0).reshape(B, N, mlp_dim)
        h = jnp.where(keep_h, h * inv, 0.0)
    h = h.astype(x.dtype)
    out = h @ w2 + b2.astype(jnp.float32)
    if dropout_rate > 0.0:
        keep_o = keep_mask((B * N, dim), seed[0], dropout_rate,
                           salt=1).reshape(B, N, dim)
        out = jnp.where(keep_o, out * inv, 0.0)
    if residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


def _fused_mlp_bwd(eps, approximate, dropout_rate, residual, res, g):
    import numpy as np

    x, gamma, beta, w1, b1, w2, b2, seed = res
    _, vjp = jax.vjp(
        lambda x, gamma, beta, w1, b1, w2, b2: mlp_reference(
            x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
            dropout_rate, residual,
        ),
        x, gamma, beta, w1, b1, w2, b2,
    )
    return (*vjp(g), np.zeros(seed.shape, dtype=jax.dtypes.float0))


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
