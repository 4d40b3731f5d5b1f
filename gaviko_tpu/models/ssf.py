"""SSF — scale-and-shift after every op of the frozen ViT.

Reference: src/model/ssf.py. ssf_ada(x) = x * scale + shift is inserted:
after the patch embed (ssf.py:236), after each attention LN / qkv / out-proj
(100-116), after each MLP LN / fc1 / fc2 (64-74), and after the final norm
(138). scale ~ N(1, .02), shift ~ N(0, .02) (14-21). The reference's
LayerScale is Identity (init_values=None, 121-123) and carries no params.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.config import ModelSpec
from gaviko_tpu.core import init as tinit
from gaviko_tpu.core import vit as vit_core
from gaviko_tpu.core.layers import (
    Params,
    RngStream,
    dropout,
    gelu,
    gelu_spec,
    layer_norm,
    linear,
    ssf_ada,
)
from gaviko_tpu.ops.attention import multi_head_attention


def _ssf(p: Params, prefix: str, idx: int, x: jax.Array) -> jax.Array:
    return ssf_ada(x, p[f"{prefix}.ssf_scale_{idx}"], p[f"{prefix}.ssf_shift_{idx}"])


def _attn_cls_branch(p, prefix, x, spec, *, train, rngs, n_true):
    """CLS-query-only attention branch with the ssf_ada insertion points of
    ``_attn_block`` (last-layer fast path; see core/vit.py cls_fast_enabled).
    The packed-qkv ssf_1 scale/shift apply sliced to the kv / q thirds."""
    h = layer_norm(p, f"{prefix}.norm", x)
    h = _ssf(p, prefix, 0, h)
    w = p[f"{prefix}.to_qkv.weight"]
    inner = w.shape[0] // 3
    sc = p[f"{prefix}.ssf_scale_1"]
    sh = p[f"{prefix}.ssf_shift_1"]
    kv = (h @ w[inner:].T) * sc[inner:] + sh[inner:]
    q0 = (h[:, 0] @ w[:inner].T) * sc[:inner] + sh[:inner]
    out = vit_core.cls_attend(kv, q0, spec, n_true=n_true, train=train,
                              rngs=rngs)
    out = linear(p, f"{prefix}.to_out.0", out.astype(x.dtype))
    out = _ssf(p, prefix, 2, out)
    return dropout(out, spec.dropout, train, rngs)


def _ff_cls_branch(p, prefix, c, spec, *, train, rngs):
    h = layer_norm(p, f"{prefix}.net.0", c)
    h = _ssf(p, prefix, 0, h)
    h = linear(p, f"{prefix}.net.1", h)
    h = _ssf(p, prefix, 1, h)
    h = gelu_spec(h, spec.gelu)
    h = dropout(h, spec.dropout, train, rngs)
    h = linear(p, f"{prefix}.net.4", h)
    h = _ssf(p, prefix, 2, h)
    return dropout(h, spec.dropout, train, rngs)


def _attn_block(p, prefix, x, spec, *, train, rngs, n_true=None):
    h = layer_norm(p, f"{prefix}.norm", x)
    h = _ssf(p, prefix, 0, h)
    qkv = h @ p[f"{prefix}.to_qkv.weight"].T
    qkv = _ssf(p, prefix, 1, qkv)  # elementwise on the packed qkv layout
    B, N, _ = qkv.shape
    heads, dh = spec.heads, spec.dim_head
    n_true = N if n_true is None else n_true

    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.flash_attention import fused_mhsa, fused_mhsa_supported

    if (
        attn_mod._DEFAULT_IMPL == "flash"
        and fused_mhsa_supported(heads, dh, N)
    ):
        drop = spec.dropout if train else 0.0
        if drop > 0.0:
            seed = rngs.next_seed().reshape(1)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        padr = (-N) % 8
        if padr:
            qkv = jnp.pad(qkv, [(0, 0), (0, padr), (0, 0)])
        out = fused_mhsa(qkv, seed, heads, dh, dh ** -0.5, n_true, drop)
        if padr:
            out = out[:, :N]
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        if n_true != N:
            qh, kh, vh = qh[:, :, :n_true], kh[:, :, :n_true], vh[:, :, :n_true]
        out = multi_head_attention(
            qh, kh, vh, scale=dh ** -0.5,
            dropout_rate=spec.dropout, dropout_enabled=train, rngs=rngs,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, heads * dh)
        if n_true != N:
            out = jnp.pad(out, [(0, 0), (0, N - n_true), (0, 0)])
    out = linear(p, f"{prefix}.to_out.0", out)
    out = _ssf(p, prefix, 2, out)
    return dropout(out, spec.dropout, train, rngs)


def _ff_block(p, prefix, x, spec, *, train, rngs):
    h = layer_norm(p, f"{prefix}.net.0", x)
    h = _ssf(p, prefix, 0, h)
    h = linear(p, f"{prefix}.net.1", h)
    h = _ssf(p, prefix, 1, h)
    h = gelu_spec(h, spec.gelu)
    h = dropout(h, spec.dropout, train, rngs)
    h = linear(p, f"{prefix}.net.4", h)
    h = _ssf(p, prefix, 2, h)
    return dropout(h, spec.dropout, train, rngs)


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rngs = RngStream(rng)
    # Custom train() (ssf.py:216-228): with freeze_vit the whole backbone is
    # eval; only the (dropout-free) head trains — so no dropout fires at all.
    bb_train = train and not spec.freeze_vit

    x = vit_core.patchify_embed(params, "conv_proj.0", img, spec)
    x = ssf_ada(x, params["ssf_scale_1"], params["ssf_shift_1"])
    x = vit_core.add_cls_and_pos(params, x)
    x = dropout(x, spec.emb_dropout, bb_train, rngs)
    n_true = x.shape[1]
    pad = (-n_true) % 8
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    fast = vit_core.cls_fast_enabled(spec)
    for i in range(spec.depth):
        if fast and i == spec.depth - 1:
            c = x[:, 0] + _attn_cls_branch(
                params, f"transformer.layers.{i}.0", x, spec,
                train=bb_train, rngs=rngs, n_true=n_true)
            c = c + _ff_cls_branch(
                params, f"transformer.layers.{i}.1", c, spec,
                train=bb_train, rngs=rngs)
            c = layer_norm(params, "transformer.norm", c)
            c = ssf_ada(c, params["transformer.ssf_scale_1"],
                        params["transformer.ssf_shift_1"])
            return linear(params, "mlp_head", c)
        x = _attn_block(params, f"transformer.layers.{i}.0", x, spec,
                        train=bb_train, rngs=rngs, n_true=n_true) + x
        x = _ff_block(params, f"transformer.layers.{i}.1", x, spec, train=bb_train, rngs=rngs) + x
    if pad:
        x = x[:, :n_true]
    x = layer_norm(params, "transformer.norm", x)
    x = ssf_ada(x, params["transformer.ssf_scale_1"], params["transformer.ssf_shift_1"])
    return vit_core.pool_and_head(params, x, spec)


def _init_scale_shift(kg, p, prefix, idx, dim, dtype):
    p[f"{prefix}ssf_scale_{idx}"] = 1.0 + 0.02 * jax.random.normal(kg(), (dim,), dtype)
    p[f"{prefix}ssf_shift_{idx}"] = 0.02 * jax.random.normal(kg(), (dim,), dtype)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    p = vit_core.vit_init(kg(), spec, dtype)
    dim, mlp = spec.dim, spec.mlp_dim
    inner3 = spec.heads * spec.dim_head * 3
    _init_scale_shift(kg, p, "", 1, dim, dtype)  # post patch embed
    _init_scale_shift(kg, p, "transformer.", 1, dim, dtype)  # post final norm
    for i in range(spec.depth):
        a = f"transformer.layers.{i}.0."
        _init_scale_shift(kg, p, a, 0, dim, dtype)
        _init_scale_shift(kg, p, a, 1, inner3, dtype)
        _init_scale_shift(kg, p, a, 2, dim, dtype)
        f = f"transformer.layers.{i}.1."
        _init_scale_shift(kg, p, f, 0, dim, dtype)
        _init_scale_shift(kg, p, f, 1, mlp, dtype)
        _init_scale_shift(kg, p, f, 2, dim, dtype)
    # init_head_weights (ssf.py:211-214)
    p["mlp_head.weight"] = tinit.xavier_uniform(kg(), (spec.num_classes, dim), dtype=dtype)
    p["mlp_head.bias"] = jnp.zeros((spec.num_classes,), dtype)
    return p
