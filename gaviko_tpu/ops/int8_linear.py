"""Opt-in int8 (w8a8) inference GEMMs: LN+linear, linear, and the full MLP.

The v5e MXU runs int8xint8->s32 dots at 2x the bf16 FLOP rate, and int8
weights halve the resident VMEM/HBM footprint. This module provides
post-training-quantized versions of the three GEMM sites of the ViT
backbone (qkv projection, attention output projection, MLP) for SERVING
only — the bf16 path remains the default and the benchmark headline; the
reference has no quantized path at all (its fp16 `model.half()` is the
closest analog, src/train.py:157).

Scheme: symmetric per-output-channel int8 weights (offline,
``quantize_weight``), symmetric per-row dynamic int8 activations
(in-kernel: amax over the feature axis -> scale -> round). Accumulation is
s32, dequantized as ``s32 * (row_scale * col_scale)`` in f32 before bias /
GELU / residual — all inside one Pallas kernel per site, so the quantize /
dequantize passes never touch HBM.

Interpret-mode on CPU (exact int math either way) backs the accuracy
tests; the quality budget vs the bf16 path is checked in
tests/test_int8.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def quantize_weight(w: jax.Array):
    """(out, in) torch-layout weight -> (int8 (out, in), f32 (1, out) scale).

    Symmetric per-output-channel: scale = amax(|w|, in-axis) / 127.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # (out, 1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.reshape(1, -1).astype(jnp.float32)  # (1, out)


def _quant_rows(xf):
    """f32 (rows, d) -> (int8 rows x d, f32 (rows, 1) scale)."""
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x_i8 = jnp.clip(jnp.round(xf * (1.0 / sx)), -127, 127).astype(jnp.int8)
    return x_i8, sx


def _ln_f32(xf, g, b, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * g + b


def _int8_linear_kernel(x_ref, g_ref, b_ref, w_ref, ws_ref, bias_ref, o_ref,
                        *, eps, ln, bias):
    xf = x_ref[:].astype(jnp.float32)
    if ln:
        xf = _ln_f32(xf, g_ref[:].astype(jnp.float32),
                     b_ref[:].astype(jnp.float32), eps)
    x_i8, sx = _quant_rows(xf)
    acc = jax.lax.dot_general(  # (block, out) s32
        x_i8, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * ws_ref[:])
    if bias:
        out = out + bias_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def int8_linear(x, w_i8, w_scale, bias=None, gamma=None, beta=None,
                eps: float = 1e-5):
    """[B, N, in] x (out, in) int8 -> [B, N, out]; optional LN prologue."""
    B, N, din = x.shape
    dout = w_i8.shape[0]
    rows = B * N
    block = 256
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, din)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
    ln = gamma is not None
    g2 = (gamma if ln else jnp.ones((din,), x.dtype)).reshape(1, din)
    b2 = (beta if ln else jnp.zeros((din,), x.dtype)).reshape(1, din)
    has_bias = bias is not None
    bias2 = (bias if has_bias else jnp.zeros((dout,), x.dtype)).reshape(1, dout)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_int8_linear_kernel, eps=eps, ln=ln, bias=has_bias),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(1, din), full(1, din),
            full(dout, din), full(1, dout), full(1, dout),
        ],
        out_specs=pl.BlockSpec((block, dout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(xf, g2, b2, w_i8, w_scale, bias2)
    return out[:rows].reshape(B, N, dout)


def _int8_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                     w2_ref, s2_ref, b2_ref, o_ref, *, eps, approximate,
                     residual):
    from gaviko_tpu.ops.fused_mlp import gelu_by_mode

    xf = x_ref[:].astype(jnp.float32)
    h = _ln_f32(xf, g_ref[:].astype(jnp.float32),
                b_ref[:].astype(jnp.float32), eps)
    h_i8, sh = _quant_rows(h)
    a = jax.lax.dot_general(
        h_i8, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (sh * s1_ref[:]) + b1_ref[:].astype(jnp.float32)
    gact = gelu_by_mode(a, approximate)
    g_i8, sg = _quant_rows(gact)
    out = jax.lax.dot_general(
        g_i8, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (sg * s2_ref[:]) + b2_ref[:].astype(jnp.float32)
    if residual:
        out = out + xf
    o_ref[:] = out.astype(o_ref.dtype)


def int8_mlp(x, gamma, beta, w1_i8, s1, b1, w2_i8, s2, b2,
             eps: float = 1e-5, approximate: bool = True,
             residual: bool = False):
    """LN -> int8 fc1 -> GELU -> int8 fc2 (+x), one kernel."""
    B, N, dim = x.shape
    mlp_dim = w1_i8.shape[0]
    rows = B * N
    block = 256
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, dim)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_int8_mlp_kernel, eps=eps, approximate=approximate,
                          residual=residual),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(1, dim), full(1, dim),
            full(mlp_dim, dim), full(1, mlp_dim), full(1, mlp_dim),
            full(dim, mlp_dim), full(1, dim), full(1, dim),
        ],
        out_specs=pl.BlockSpec((block, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(xf, gamma.reshape(1, dim), beta.reshape(1, dim),
      w1_i8, s1, b1.reshape(1, mlp_dim), w2_i8, s2, b2.reshape(1, dim))
    return out[:rows].reshape(B, N, dim)


# Sidecar param-key suffixes carrying the quantized backbone.
INT8_SUFFIX = "::int8"
SCALE_SUFFIX = "::int8_scale"

# GEMM sites quantized (key suffixes; match every block-naming scheme:
# vanilla transformer.layers.{i}.{0,1}.*, GAViKO transformer.attns/mlps.{i}).
_SITE_SUFFIXES = (".to_qkv.weight", ".to_out.0.weight",
                  ".net.1.weight", ".net.4.weight")


def quantize_backbone(params: dict, depth: int | None = None) -> dict:
    """Add int8 sidecar entries for every backbone GEMM weight.

    Returns a NEW flat dict: original params plus ``<key>::int8`` /
    ``<key>::int8_scale`` pairs. The bf16 originals stay (checkpoint and
    fallback contracts keep working); the model's fused path switches to
    the int8 kernels when it sees the sidecars (core/vit.py). ``depth`` is
    accepted for API stability but unused (sites are found by key scan).
    """
    if any("ssf_scale" in k for k in params):
        # SSF inserts ssf_ada between LN and every GEMM (models/ssf.py), so
        # its blocks bypass the int8-gated core paths — and the int8
        # kernels' fused LN would be semantically wrong there anyway.
        # Adding sidecars would cost ~25% resident memory for math nobody
        # consumes; refuse loudly instead of silently serving fp.
        import logging

        logging.warning(
            "int8 quantization is not supported for SSF models "
            "(ssf_ada sits between LN and the GEMMs); serving full precision."
        )
        return dict(params)
    out = dict(params)
    for key in list(params):
        # GAViKO's local-attention stack has matching names but consumes
        # weights inside its own masked kernel (no int8 branch there yet).
        if key.endswith(_SITE_SUFFIXES) and ".local_attns." not in key:
            w_i8, scale = quantize_weight(out[key])
            out[key + INT8_SUFFIX] = w_i8
            out[key + SCALE_SUFFIX] = scale
    return out


def has_int8(params: dict, key: str) -> bool:
    return (key + INT8_SUFFIX) in params
