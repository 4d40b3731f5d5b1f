"""Shared 3D-ViT building blocks + the plain VisionTransformer model.

TPU-first design choices vs the reference (src/model/vision_transformer.py):
- The non-overlapping Conv3d patch embed (kernel == stride) is a pure
  reshape + matmul; we lower it that way so it lands on the MXU as one
  [B*N, patch_dim] x [patch_dim, dim] GEMM instead of a conv window scan.
- Attention dispatches to a blockwise Pallas flash kernel (no N^2 HBM
  tensor) or the XLA reference path (ops/attention.py).
- Params are a flat dict keyed by the reference's state_dict names, e.g.
  "transformer.layers.3.0.to_qkv.weight" (torch (out, in) layout).

Methods ``linear`` / ``bitfit`` / ``fft`` are this model plus a trainable-name
filter (ref: src/train.py:111-137); see models/factory.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.config import ModelSpec
from gaviko_tpu.core import init as tinit
from gaviko_tpu.core.layers import (
    Params,
    RngStream,
    dropout,
    gelu,
    gelu_spec,
    layer_norm,
    linear,
)
from gaviko_tpu.ops.attention import multi_head_attention


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def patchify_embed(p: Params, prefix: str, img: jax.Array, spec: ModelSpec,
                   pos: Optional[jax.Array] = None) -> jax.Array:
    """[B, C, D, H, W] -> [B, N, dim] tokens in (d, h, w) row-major order.

    Equivalent to the reference's Conv3d(kernel=stride=patch) + flatten +
    transpose (vision_transformer.py:126-128, 150-151), lowered as
    reshape + GEMM. ``pos``: optional (N, dim) positional rows folded into
    the embedding epilogue (saves the standalone XLA add pass).
    """
    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.patchify import patchify_fused, patchify_supported

    w = p[f"{prefix}.weight"]  # (dim, C, pd, ph, pw)
    bias = p[f"{prefix}.bias"]
    if attn_mod._DEFAULT_IMPL == "flash" and patchify_supported(spec):
        # Pallas VMEM-gather kernel: ~3x faster than XLA's 8D-transpose
        # lowering on v5e (see ops/patchify.py).
        pz = pos if pos is not None else jnp.zeros(
            (spec.num_patches, w.shape[0]), img.dtype)
        return patchify_fused(img, w, bias, pz, spec)
    B, C, D, H, W = img.shape
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    gd, gh, gw = D // pd, H // ph, W // pw
    x = img.reshape(B, C, gd, pd, gh, ph, gw, pw)
    # -> [B, gd, gh, gw, C, pd, ph, pw]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    x = x.reshape(B, gd * gh * gw, C * pd * ph * pw)
    w2 = w.reshape(w.shape[0], -1)  # (dim, patch_dim)
    y = jnp.einsum("bnk,dk->bnd", x, w2, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + bias
    if pos is not None:
        y = y + pos.astype(y.dtype)
    return y


def attention_block(
    p: Params,
    prefix: str,
    x: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rngs: Optional[RngStream] = None,
    qkv_override=None,
    n_true: Optional[int] = None,
) -> jax.Array:
    """Pre-norm MHSA (ref: vision_transformer.py:40-72). Returns the branch
    output (caller adds the residual). ``qkv_override(x_normed) -> qkv`` lets
    MeLO inject its LoRA-augmented qkv projection. ``n_true`` marks the real
    token count when the stream carries padding rows (keys >= n_true are
    masked; padded rows' outputs are garbage by contract)."""
    import os

    from gaviko_tpu.ops import attention as _attn_mod
    from gaviko_tpu.ops.ln_linear import (
        fused_ln_linear,
        ln_linear_hybrid,
        ln_linear_hybrid_supported,
        ln_linear_supported,
    )

    # MeLO layers carry nested to_qkv.qkv names and inject qkv_override, so
    # only resolve the plain name when no override is given.
    from gaviko_tpu.ops.int8_linear import (
        INT8_SUFFIX, SCALE_SUFFIX, has_int8, int8_linear)

    wq = None if qkv_override is not None else p[f"{prefix}.to_qkv.weight"]
    if qkv_override is not None:
        qkv = qkv_override(layer_norm(p, f"{prefix}.norm", x))
    elif (not train and wq is not None
          and has_int8(p, f"{prefix}.to_qkv.weight")):
        # Opt-in w8a8 serving path (ops/int8_linear.py): LN + dynamic
        # per-row activation quant + int8 MXU dot in one kernel.
        qkv = int8_linear(
            x, p[f"{prefix}.to_qkv.weight" + INT8_SUFFIX],
            p[f"{prefix}.to_qkv.weight" + SCALE_SUFFIX],
            gamma=p[f"{prefix}.norm.weight"], beta=p[f"{prefix}.norm.bias"],
        )
    elif (
        _attn_mod._DEFAULT_IMPL == "flash"
        and not train
        and wq.dtype == x.dtype
        and ln_linear_supported(x.shape[-1], wq.shape[0], x.dtype)
    ):
        # LN fused into the qkv GEMM: the normalized activations never
        # round-trip HBM (ops/ln_linear.py). Inference-only: measured +3%
        # at vit-b16 B32 eval but -4% on the train step (XLA's fused
        # LN+GEMM VJP beats the kernel's backward there).
        qkv = fused_ln_linear(
            x, p[f"{prefix}.norm.weight"], p[f"{prefix}.norm.bias"], wq
        )
    elif (
        _attn_mod._DEFAULT_IMPL == "flash"
        and train
        and wq.dtype == x.dtype
        and os.environ.get("GAVIKO_LNQKV_HYBRID", "0") == "1"
        and ln_linear_hybrid_supported(x.shape[-1], wq.shape[0], x.dtype)
    ):
        # MEASURED OFF (default "0"): the Pallas LN+qkv backward loses big to
        # XLA's VJP on the full train step (57.4 vs 45.9 ms at vit-b16 B8 —
        # the f32 dW scratch accumulation thrashes VMEM, and the trace shows
        # XLA already fuses the dW dots with the grad-norm square-sums at
        # ~0.165 ms/layer, near the 0.145 floor). Kept behind the env flag as
        # the measured-and-rejected variant; see ARCHITECTURE.md round 3.
        qkv = ln_linear_hybrid(
            x, p[f"{prefix}.norm.weight"], p[f"{prefix}.norm.bias"], wq
        )
    else:
        qkv = None  # plain path: deferred so mhsa_qkv_proj can own the GEMM
    B, N, _ = x.shape
    heads, dh = spec.heads, spec.dim_head
    n_true = N if n_true is None else n_true

    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.flash_attention import (
        fused_mhsa,
        fused_mhsa_supported,
        mhsa_qkv_proj,
    )

    # In-kernel hash dropout keeps the fused path active in training too
    # (the reference's primary mode); the custom VJP replays the same mask.
    use_fused = (
        attn_mod._DEFAULT_IMPL == "flash"
        and fused_mhsa_supported(heads, dh, N)
    )
    if use_fused:
        drop = spec.dropout if train else 0.0
        if drop > 0.0:
            seed = rngs.next_seed().reshape(1)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        pad = (-N) % 8
        if qkv is None and pad == 0:
            # Projection + attention under ONE custom VJP: the backward
            # emits (dh, dW) directly, so the [B, N, 3*inner] dqkv
            # cotangent is never packed (XLA materialized that concat as
            # AllocateBuffer + 3 DUS writes — 2.5 ms/step at B16; see
            # ops/flash_attention.mhsa_qkv_proj).
            h_ln = layer_norm(p, f"{prefix}.norm", x)
            out = mhsa_qkv_proj(h_ln, wq, seed, heads, dh, dh ** -0.5,
                                n_true, drop)
        else:
            if qkv is None:
                qkv = layer_norm(p, f"{prefix}.norm", x) @ wq.T
            if pad:
                qkv = jnp.pad(qkv, [(0, 0), (0, pad), (0, 0)])
            out = fused_mhsa(qkv, seed, heads, dh, dh ** -0.5, n_true, drop)
            if pad:
                out = out[:, :N]
    else:
        if qkv is None:
            qkv = layer_norm(p, f"{prefix}.norm", x) @ wq.T
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        if n_true != N:  # slice away padding rows on the reference path
            qh, kh, vh = qh[:, :, :n_true], kh[:, :, :n_true], vh[:, :, :n_true]
        out = multi_head_attention(
            qh, kh, vh,
            scale=dh ** -0.5,
            dropout_rate=spec.dropout,
            dropout_enabled=train,
            rngs=rngs,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, heads * dh)
        if n_true != N:
            out = jnp.pad(out, [(0, 0), (0, N - n_true), (0, 0)])
    if not train and has_int8(p, f"{prefix}.to_out.0.weight"):
        out = int8_linear(
            out, p[f"{prefix}.to_out.0.weight" + INT8_SUFFIX],
            p[f"{prefix}.to_out.0.weight" + SCALE_SUFFIX],
            bias=p[f"{prefix}.to_out.0.bias"],
        )
    else:
        out = linear(p, f"{prefix}.to_out.0", out)
    out = dropout(out, spec.dropout, train, rngs)
    return out


def attention_block_res(
    p: Params,
    prefix: str,
    x: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rngs: Optional[RngStream] = None,
    n_true: Optional[int] = None,
) -> jax.Array:
    """x + attention branch (the universal `attention_block(...) + x` pattern).

    A deliberate NON-fusion: folding the out-projection + residual into the
    attention kernel was built and measured (round 2) at +0.4 ms/layer over
    the composed path at vit-b16 B32 — XLA already fuses the residual add
    into the projection GEMM's epilogue, and the in-kernel per-head-pair
    projection partials lose MXU efficiency. The composed path (XLA LN +
    one big qkv GEMM + fused_mhsa + XLA proj/residual) is the measured
    optimum; this wrapper exists as the single dispatch point.
    """
    return attention_block(p, prefix, x, spec, train=train, rngs=rngs,
                           n_true=n_true) + x


def feedforward_block(
    p: Params,
    prefix: str,
    x: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    """LN -> Linear -> GELU -> Dropout -> Linear -> Dropout
    (ref: vision_transformer.py:26-38). Returns the branch output."""
    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.fused_mlp import fused_mlp, fused_mlp_supported
    from gaviko_tpu.ops.int8_linear import (
        INT8_SUFFIX, SCALE_SUFFIX, has_int8, int8_mlp)

    if not train and has_int8(p, f"{prefix}.net.1.weight"):
        # Opt-in w8a8 serving path (ops/int8_linear.py), branch only.
        return int8_mlp(
            x, p[f"{prefix}.net.0.weight"], p[f"{prefix}.net.0.bias"],
            p[f"{prefix}.net.1.weight" + INT8_SUFFIX],
            p[f"{prefix}.net.1.weight" + SCALE_SUFFIX],
            p[f"{prefix}.net.1.bias"],
            p[f"{prefix}.net.4.weight" + INT8_SUFFIX],
            p[f"{prefix}.net.4.weight" + SCALE_SUFFIX],
            p[f"{prefix}.net.4.bias"],
            1e-5, spec.gelu, residual=False,
        )
    if (
        attn_mod._DEFAULT_IMPL == "flash"
        and fused_mlp_supported(x.shape[-1], p[f"{prefix}.net.1.weight"].shape[0], x.dtype)
    ):
        # Fused kernel keeps the (tokens, mlp_dim) hidden in VMEM only;
        # training dropout runs in-kernel with a mask-replaying backward.
        drop = spec.dropout if train else 0.0
        if drop > 0.0:
            seed = rngs.next_seed().reshape(1)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        return fused_mlp(
            x,
            p[f"{prefix}.net.0.weight"], p[f"{prefix}.net.0.bias"],
            p[f"{prefix}.net.1.weight"], p[f"{prefix}.net.1.bias"],
            p[f"{prefix}.net.4.weight"], p[f"{prefix}.net.4.bias"],
            seed, 1e-5, spec.gelu, drop,
        )
    h = layer_norm(p, f"{prefix}.net.0", x)
    h = linear(p, f"{prefix}.net.1", h)
    h = gelu_spec(h, spec.gelu)
    h = dropout(h, spec.dropout, train, rngs)
    h = linear(p, f"{prefix}.net.4", h)
    h = dropout(h, spec.dropout, train, rngs)
    return h


def feedforward_block_res(
    p: Params,
    prefix: str,
    x: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rngs: Optional[RngStream] = None,
) -> jax.Array:
    """x + MLP branch; the residual add runs inside the fused kernel (the x
    block is already resident in VMEM), saving a 3-tensor HBM pass/layer."""
    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.fused_mlp import fused_mlp, fused_mlp_supported
    from gaviko_tpu.ops.int8_linear import (
        INT8_SUFFIX, SCALE_SUFFIX, has_int8, int8_mlp)

    if not train and has_int8(p, f"{prefix}.net.1.weight"):
        # Opt-in w8a8 serving path: LN + int8 fc1 + GELU + int8 fc2 + x in
        # one kernel (ops/int8_linear.py).
        return int8_mlp(
            x, p[f"{prefix}.net.0.weight"], p[f"{prefix}.net.0.bias"],
            p[f"{prefix}.net.1.weight" + INT8_SUFFIX],
            p[f"{prefix}.net.1.weight" + SCALE_SUFFIX],
            p[f"{prefix}.net.1.bias"],
            p[f"{prefix}.net.4.weight" + INT8_SUFFIX],
            p[f"{prefix}.net.4.weight" + SCALE_SUFFIX],
            p[f"{prefix}.net.4.bias"],
            1e-5, spec.gelu, residual=True,
        )
    if (
        attn_mod._DEFAULT_IMPL == "flash"
        and fused_mlp_supported(x.shape[-1], p[f"{prefix}.net.1.weight"].shape[0], x.dtype)
    ):
        drop = spec.dropout if train else 0.0
        if drop > 0.0:
            seed = rngs.next_seed().reshape(1)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        return fused_mlp(
            x,
            p[f"{prefix}.net.0.weight"], p[f"{prefix}.net.0.bias"],
            p[f"{prefix}.net.1.weight"], p[f"{prefix}.net.1.bias"],
            p[f"{prefix}.net.4.weight"], p[f"{prefix}.net.4.bias"],
            seed, 1e-5, spec.gelu, drop, True,
        )
    return feedforward_block(p, prefix, x, spec, train=train, rngs=rngs) + x


def _has_int8_last(params: Params, spec: ModelSpec) -> bool:
    """True when the last layer carries int8 serving weights (the cls fast
    path defers to the int8 kernels rather than re-running fp math)."""
    from gaviko_tpu.ops.int8_linear import has_int8

    pre = f"transformer.layers.{spec.depth - 1}"
    return (has_int8(params, f"{pre}.0.to_qkv.weight")
            or has_int8(params, f"{pre}.1.net.1.weight"))


def attention_cls_branch(p: Params, prefix: str, x: jax.Array,
                         spec: ModelSpec, *, n_true: int,
                         train: bool = False,
                         rngs: Optional[RngStream] = None) -> jax.Array:
    """Attention branch output for query row 0 ONLY: (B, inner).

    FLOP cut for ``pool='cls'``: in the LAST transformer layer the model
    output (and therefore the loss) consumes nothing but the CLS row, so
    the Q projection, the score/AV dots, and the out-projection are needed
    for one query row — K/V still span every (real) token, and in training
    the cotangents still reach every row's parameters through dK/dV. The
    math is exactly ``attention_block(...)[:, 0]`` (row-wise LN/softmax
    restricted to the rows that matter); the N x N score tensor of the
    last layer never exists. The reference computes the full layer and
    discards all but row 0 (ref: vision_transformer.py:60-72, 158-162).

    In training the differentiable XLA form is used (autodiff supplies the
    backward; the saved last-layer activations are one-row-sized) with
    dropout on the attention probabilities, matching the full path's
    in-kernel prob dropout site.
    """
    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.ln_linear import fused_ln_linear, ln_linear_supported

    heads, dh = spec.heads, spec.dim_head
    inner = heads * dh
    wq = p[f"{prefix}.to_qkv.weight"]  # (3*inner, dim); rows = [q | k | v]
    w_kv = wq[inner:]
    if (
        attn_mod._DEFAULT_IMPL == "flash"
        and not train
        and wq.dtype == x.dtype
        and ln_linear_supported(x.shape[-1], 2 * inner, x.dtype)
    ):
        kv = fused_ln_linear(
            x, p[f"{prefix}.norm.weight"], p[f"{prefix}.norm.bias"], w_kv
        )
    else:
        kv = layer_norm(p, f"{prefix}.norm", x) @ w_kv.T
    # Q for the CLS row alone: LN of one row + a (B, dim) x (dim, inner) dot.
    q0 = layer_norm(p, f"{prefix}.norm", x[:, 0]) @ wq[:inner].T
    out = cls_attend(kv, q0, spec, n_true=n_true, train=train, rngs=rngs)
    out = linear(p, f"{prefix}.to_out.0", out.astype(x.dtype))
    return dropout(out, spec.dropout, train, rngs)


def cls_attend(kv: jax.Array, q0: jax.Array, spec: ModelSpec, *,
               n_true: int, train: bool = False,
               rngs: Optional[RngStream] = None) -> jax.Array:
    """Single-query attention core: kv (B, N, 2*inner) packed [K | V],
    q0 (B, inner) -> (B, inner). Dispatches to the Pallas kernel at
    inference, a differentiable dropout-carrying form in training, and the
    XLA twin otherwise. Shared by every model's last-layer fast path."""
    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.cls_attention import (
        cls_attention,
        cls_attention_reference,
        cls_attention_supported,
    )

    heads, dh = spec.heads, spec.dim_head
    inner = heads * dh
    B, N, _ = kv.shape
    drop = spec.dropout if train else 0.0
    if (not train
            and attn_mod._DEFAULT_IMPL == "flash"
            and cls_attention_supported(heads, dh, N, kv.dtype)):
        # One VMEM pass over the packed KV (ops/cls_attention.py); the XLA
        # lowerings all materialize an extra f32 (B, N, inner) tensor.
        return cls_attention(kv, q0, heads, dh, dh ** -0.5, n_true)
    if drop > 0.0:
        # Differentiable form with prob dropout (the full path drops
        # attention probabilities in-kernel; same semantic site here).
        f32 = jnp.float32
        k, v = kv[..., :inner], kv[..., inner:]
        s = (k.astype(f32) * q0[:, None, :].astype(f32)) \
            .reshape(B, N, heads, dh).sum(-1) * (dh ** -0.5)
        if n_true != N:
            s = jnp.where((jnp.arange(N) >= n_true)[:, None], -jnp.inf, s)
        a = jax.nn.softmax(s, axis=1)
        a = dropout(a, drop, train, rngs)
        o = (v.astype(f32).reshape(B, N, heads, dh) * a[..., None]).sum(1)
        return o.reshape(B, inner)
    return cls_attention_reference(kv, q0, heads, dh, dh ** -0.5, n_true)


def cls_fast_enabled(spec: ModelSpec) -> bool:
    """Shared gate for the last-layer fast path (pool='cls' models)."""
    import os

    return (spec.pool == "cls"
            and os.environ.get("GAVIKO_CLS_FAST", "1") == "1")


def feedforward_cls_branch(p: Params, prefix: str, c: jax.Array,
                           spec: ModelSpec, *, train: bool = False,
                           rngs: Optional[RngStream] = None) -> jax.Array:
    """MLP branch on the pooled (B, dim) CLS rows (last-layer fast path)."""
    h = layer_norm(p, f"{prefix}.net.0", c)
    h = linear(p, f"{prefix}.net.1", h)
    h = gelu_spec(h, spec.gelu)
    h = dropout(h, spec.dropout, train, rngs)
    h = linear(p, f"{prefix}.net.4", h)
    return dropout(h, spec.dropout, train, rngs)


def add_cls_and_pos(p: Params, tokens: jax.Array) -> jax.Array:
    """Prepend cls token and add pos embedding (ref: vision_transformer.py:154-156)."""
    B, n, _ = tokens.shape
    cls = jnp.broadcast_to(p["cls_token"], (B, 1, tokens.shape[-1])).astype(tokens.dtype)
    x = jnp.concatenate([cls, tokens], axis=1)
    return x + p["pos_embedding"][:, : n + 1].astype(tokens.dtype)


def pool_and_head(p: Params, x: jax.Array, spec: ModelSpec) -> jax.Array:
    pooled = x.mean(axis=1) if spec.pool == "mean" else x[:, 0]
    return linear(p, "mlp_head", pooled)


# ---------------------------------------------------------------------------
# Plain VisionTransformer
# ---------------------------------------------------------------------------

def vit_apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward pass of the plain 3D ViT (ref: vision_transformer.py:149-164).

    For methods linear/bitfit/fft the reference has no custom ``train()``, so
    in training mode every dropout (including over frozen blocks) is active —
    ``train=True`` reproduces that.
    """
    rngs = RngStream(rng)
    # Token positional rows fold into the patchify epilogue; only the cls
    # row's pos is added here.
    pos = params["pos_embedding"]
    x = patchify_embed(params, "conv_proj.0", img, spec,
                       pos=pos[0, 1:1 + spec.num_patches])
    B = x.shape[0]
    cls = (params["cls_token"][0] + pos[:, 0]).astype(x.dtype)
    x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, x.shape[-1])), x],
                        axis=1)
    x = dropout(x, spec.emb_dropout, train, rngs)
    # Pad the token stream ONCE to a tile-friendly length; attention masks
    # keys >= n_true and the pad rows are sliced off before pooling. This
    # removes per-layer pad/slice copies around the fused kernel.
    n_true = x.shape[1]
    pad = (-n_true) % 8
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    # CLS fast path: with pool='cls' the model output — and in training
    # the LOSS — is consumed only at row 0 of the last layer, so run that
    # layer CLS-query-only (exact math; in training the cotangents of the
    # discarded rows are identically zero, and grads still reach every
    # row's parameters through dK/dV). ~6% fewer forward FLOPs at depth
    # 12, and the saved last-layer activations shrink to one row. Gated
    # off for mean pool and when the last layer's fp weights were swapped
    # for int8 serving weights.
    fast_cls = (
        cls_fast_enabled(spec)
        and f"transformer.layers.{spec.depth - 1}.0.to_qkv.weight" in params
        # int8 serving sidecars route the last layer through the int8
        # kernels at inference; training ignores sidecars entirely, so the
        # fast path must not gate on them there (the dropout stream has to
        # match the sidecar-free params).
        and (train or not _has_int8_last(params, spec))
    )
    depth_full = spec.depth - 1 if fast_cls else spec.depth
    for i in range(depth_full):
        x = attention_block_res(
            params, f"transformer.layers.{i}.0", x, spec, train=train,
            rngs=rngs, n_true=n_true,
        )
        x = feedforward_block_res(
            params, f"transformer.layers.{i}.1", x, spec, train=train,
            rngs=rngs,
        )
    if fast_cls:
        i = spec.depth - 1
        c = x[:, 0] + attention_cls_branch(
            params, f"transformer.layers.{i}.0", x, spec, n_true=n_true,
            train=train, rngs=rngs,
        )
        c = c + feedforward_cls_branch(
            params, f"transformer.layers.{i}.1", c, spec, train=train,
            rngs=rngs,
        )
        return linear(
            params, "mlp_head", layer_norm(params, "transformer.norm", c)
        )
    if spec.pool == "cls":
        # LayerNorm is per-token, so pooling the cls row FIRST is exact and
        # skips a full (B, N, dim) normalization pass (row 0 is never a pad
        # row, so the pad slice is unnecessary too).
        return linear(
            params, "mlp_head",
            layer_norm(params, "transformer.norm", x[:, 0]),
        )
    if pad:
        x = x[:, :n_true]
    x = layer_norm(params, "transformer.norm", x)
    return pool_and_head(params, x, spec)


def vit_init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    """Init matching the reference's parameter set & torch-default distributions."""
    kg = tinit.KeyGen(rng)
    dim, mlp = spec.dim, spec.mlp_dim
    inner = spec.heads * spec.dim_head
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    p: Dict[str, jax.Array] = {}
    p["conv_proj.0.weight"] = tinit.torch_conv3d_weight(
        kg(), dim, spec.channels, (pd, ph, pw), dtype
    )
    p["conv_proj.0.bias"] = tinit.torch_conv3d_bias(
        kg(), dim, spec.channels, (pd, ph, pw), dtype
    )
    p["pos_embedding"] = jax.random.normal(kg(), (1, spec.num_patches + 1, dim), dtype)
    p["cls_token"] = jax.random.normal(kg(), (1, 1, dim), dtype)
    for i in range(spec.depth):
        a = f"transformer.layers.{i}.0"
        p[f"{a}.norm.weight"] = jnp.ones((dim,), dtype)
        p[f"{a}.norm.bias"] = jnp.zeros((dim,), dtype)
        p[f"{a}.to_qkv.weight"] = tinit.torch_linear_weight(kg(), inner * 3, dim, dtype)
        p[f"{a}.to_out.0.weight"] = tinit.torch_linear_weight(kg(), dim, inner, dtype)
        p[f"{a}.to_out.0.bias"] = tinit.torch_linear_bias(kg(), dim, inner, dtype)
        f = f"transformer.layers.{i}.1"
        p[f"{f}.net.0.weight"] = jnp.ones((dim,), dtype)
        p[f"{f}.net.0.bias"] = jnp.zeros((dim,), dtype)
        p[f"{f}.net.1.weight"] = tinit.torch_linear_weight(kg(), mlp, dim, dtype)
        p[f"{f}.net.1.bias"] = tinit.torch_linear_bias(kg(), mlp, dim, dtype)
        p[f"{f}.net.4.weight"] = tinit.torch_linear_weight(kg(), dim, mlp, dtype)
        p[f"{f}.net.4.bias"] = tinit.torch_linear_bias(kg(), dim, mlp, dtype)
    p["transformer.norm.weight"] = jnp.ones((dim,), dtype)
    p["transformer.norm.bias"] = jnp.zeros((dim,), dtype)
    p["mlp_head.weight"] = tinit.torch_linear_weight(kg(), spec.num_classes, dim, dtype)
    p["mlp_head.bias"] = tinit.torch_linear_bias(kg(), spec.num_classes, dim, dtype)
    return p
