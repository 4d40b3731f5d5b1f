"""Pallas single-query (CLS) attention: one VMEM pass over the packed KV.

Serves the inference fast path for ``pool='cls'`` models (core/vit.py):
in the LAST transformer layer only the CLS row's output is consumed, so
attention reduces to one query against all keys. The reference computes the
full N x N layer and discards every row but 0
(ref: src/model/vision_transformer.py:60-72, 158-162).

Why a kernel: the XLA lowerings of the single-query contraction are all
bandwidth-wasteful — a (b, h)-batched dot materializes transposed f32 copies
of K and V (~0.6 ms at vit-b16 B32), and the broadcast-multiply-reduce
formulation materializes the f32 (B, N, heads, dh) product (~0.3 ms). Here
each program holds one batch row's (N, 2*inner) KV block in VMEM and reads
it exactly once (~0.12 ms at B32 on v5e HBM).

Mosaic shape note: the per-head reductions need a lane-dim (inner) ->
(heads, dh) split, which Mosaic forbids as a shape cast; both are expressed
as MXU matmuls against a block-diagonal head-indicator matrix G with
G[f, h] = [f // dh == h] (the house permutation-matmul trick):

    scores[n, h] = sum_f (K[n, f] * q0[f]) G[f, h]      # (N, Hp) = p @ G
    a_exp[n, f]  = sum_h a[n, h] G[f, h]                # (N, F)  = a @ G^T
    out[f]       = sum_n a_exp[n, f] * V[n, f]

heads is padded to Hp = 128 lanes inside the kernel; the pad columns hold
softmax garbage that G^T's zero rows never read back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_LIMIT = 64 * 1024 * 1024
_HP = 128  # heads padded to one full lane tile


def cls_attention_supported(heads: int, dim_head: int, n: int, dtype) -> bool:
    """One (N, 2*inner) block + f32 intermediates must sit in VMEM."""
    inner = heads * dim_head
    if heads > _HP or inner % 128 != 0 or n % 8 != 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # kv block + f32 product + f32 a_exp (the dominant residents)
    need = n * 2 * inner * itemsize + 2 * n * inner * 4
    return need <= 28 * 1024 * 1024


def _cls_attention_kernel(kv_ref, q_ref, o_ref, *, heads, dim_head, scale,
                          n_true):
    inner = heads * dim_head
    n = kv_ref.shape[1]
    k = kv_ref[0, :, :inner]
    v = kv_ref[0, :, inner:]
    # G: (inner, _HP) block-diagonal head indicator, f32 (built in-register;
    # rows of head h are ones in column h, pad columns stay zero).
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (inner, _HP), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (inner, _HP), 1)
    g = (f_idx // dim_head == h_idx).astype(jnp.float32)

    p = k.astype(jnp.float32) * q_ref[0].astype(jnp.float32)  # (N, inner)
    s = jax.lax.dot_general(
        p, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N, _HP)
    if n_true != n:  # static pad-row mask (keys >= n_true never attend)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, _HP), 0)
        s = jnp.where(row >= n_true, -jnp.inf, s)
    # Softmax over N (sublane dim). Pad HEAD columns (h >= heads) hold
    # garbage that g's zero rows drop at the expansion matmul below.
    m = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - m)
    a = e / jnp.sum(e, axis=0, keepdims=True)  # (N, _HP)
    a_exp = jax.lax.dot_general(
        a, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, inner)
    o = jnp.sum(a_exp * v.astype(jnp.float32), axis=0, keepdims=True)
    o_ref[0] = o.astype(o_ref.dtype)


def cls_attention(kv: jax.Array, q0: jax.Array, heads: int, dim_head: int,
                  scale: float, n_true: int) -> jax.Array:
    """kv: (B, N, 2*inner) packed [K | V]; q0: (B, inner). -> (B, inner).

    Exact math of ``softmax(q0 K^T * scale) V`` per head with keys/values
    restricted to rows < n_true.
    """
    B, N, two_inner = kv.shape
    inner = heads * dim_head
    assert two_inner == 2 * inner and q0.shape == (B, inner)
    out = pl.pallas_call(
        functools.partial(
            _cls_attention_kernel, heads=heads, dim_head=dim_head,
            scale=scale, n_true=n_true,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, two_inner), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, inner) so the trailing block dims equal the array dims
            # (Mosaic's 8/128 divisibility rule exempts exact matches).
            pl.BlockSpec((1, 1, inner), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, inner), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, inner), kv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(kv, q0[:, None, :])
    return out[:, 0]


def cls_attention_reference(kv, q0, heads, dim_head, scale, n_true):
    """Pure-XLA twin (backs the CPU tests and unsupported geometries)."""
    B, N, _ = kv.shape
    inner = heads * dim_head
    f32 = jnp.float32
    k, v = kv[..., :inner], kv[..., inner:]
    s = (k.astype(f32) * q0[:, None, :].astype(f32)) \
        .reshape(B, N, heads, dim_head).sum(-1) * scale  # (B, N, heads)
    if n_true != N:
        s = jnp.where((jnp.arange(N) >= n_true)[:, None], -jnp.inf, s)
    a = jax.nn.softmax(s, axis=1)
    o = (v.astype(f32).reshape(B, N, heads, dim_head) * a[..., None]).sum(1)
    return o.reshape(B, inner).astype(kv.dtype)
