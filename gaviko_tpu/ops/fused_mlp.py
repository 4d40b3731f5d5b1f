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
                *, eps, approximate):
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
    y = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def fused_mlp_supported(dim: int, mlp_dim: int, dtype) -> bool:
    # Both weight matrices + a row block must fit VMEM.
    itemsize = jnp.dtype(dtype).itemsize
    weights = 2 * dim * mlp_dim * itemsize
    return dim % 128 == 0 and mlp_dim % 128 == 0 and weights < 11_000_000


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
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, approximate=approximate),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mlp_dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), x.dtype),
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
