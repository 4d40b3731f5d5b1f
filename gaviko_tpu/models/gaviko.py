"""GAViKO — dual-stream prompt-fused 3D ViT (the flagship model).

Reference: src/model/gaviko.py. Forward (531-551): patchify ->
global stream = [prompts(P) | cls | N image tokens] with prompt pos-emb
concat; local stream = image tokens + pos_emb[1:]. Per layer i
(Transformer.forward 291-306), with j = i // share_factor:

    local  = local_attns[j](local) + local     # masked 1-head attn, 20-d latent
    global = attns[i](global) + global         # full MHSA
    prompt = prompt_projs[j](global, local)    # Awakening_Prompt (GPA)
    global = mlps[i](global) + global + prompt

Head: Linear over mean of [prompts | cls] (AdaptiveFusionHead, 308-325).

Reproduced reference quirks (parity-critical):
- LocalSelfAttention scales scores by the FULL model dim ** -0.5, not the
  20-d latent (gaviko.py:201, 235).
- GlobalAttention double-slices: it receives the already-sliced image latent
  and slices [:, P+1:] AGAIN, so the global context attends over image
  tokens P+1..N-1 only (gaviko.py:107, 170).
- Awakening_Prompt passes cls/img through proj_up unscaled; only the prompt
  rows get importance/gating (gaviko.py:181-187).
- ``global_query``/``local_query`` are aliases of the fusion attentions'
  ``query_proj`` modules (gaviko.py:144-145), so the torch state_dict holds
  duplicate entries under both names; see ALIASES.
- init zeroes local proj_down.bias twice and never proj_up.bias
  (gaviko.py:494, 503), which keeps torch Linear default init.
"""

from __future__ import annotations

import math
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
    layer_norm,
    linear,
    quick_gelu,
)
from gaviko_tpu.ops.local_attention import masked_local_attention


def n_unique(spec: ModelSpec) -> int:
    return math.ceil(spec.depth / spec.share_factor)


def aliases(spec: ModelSpec) -> dict[str, str]:
    """alias key -> canonical key (duplicate state_dict entries in torch)."""
    out = {}
    for j in range(n_unique(spec)):
        pp = f"transformer.prompt_projs.{j}"
        for kind, attn in (("global", "global_attention"), ("local", "local_attention")):
            for leaf in ("weight", "bias"):
                out[f"{pp}.{kind}_query.{leaf}"] = f"{pp}.{attn}.query_proj.{leaf}"
    return out


def _local_self_attention(
    p: Params, prefix: str, x: jax.Array, spec: ModelSpec,
    *, train: bool, rngs: Optional[RngStream], impl: str = "xla",
) -> jax.Array:
    """Ref: gaviko.py:229-244. Returns branch output (caller adds residual).

    Training-mode attention-prob dropout (the reference's attn_drop) runs
    in-kernel via hash bits with a mask-replaying backward, so the blockwise
    kernel carries the REAL training workload; the XLA impl replays the same
    bits and is bit-identical for the same rng stream.
    """

    h = layer_norm(p, f"{prefix}.norm", x)
    h = linear(p, f"{prefix}.proj_down", h)  # [B, N, local_dim]
    qkv = h @ p[f"{prefix}.qkv.weight"].T  # qkv_bias=False
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = spec.dim ** -0.5  # full model dim (reference quirk, gaviko.py:201)
    drop = spec.attn_drop if train else 0.0
    seed = rngs.next_seed().reshape(1) if drop > 0.0 else None
    out = masked_local_attention(
        q, k, v, scale=scale, DHW=spec.DHW, local_k=spec.local_k, impl=impl,
        seed=seed, dropout_rate=drop,
    )
    out = linear(p, f"{prefix}.proj_up", out)
    out = dropout(out, spec.proj_drop, train, rngs)
    return out


def _fusion_cross_attention(q: jax.Array, tokens: jax.Array, latent_dim: int) -> jax.Array:
    """Single-head cross-attn in the latent space (ref: gaviko.py:84-94)."""
    scale = latent_dim ** -0.5
    dots = jnp.einsum("bpd,bnd->bpn", q, tokens, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(tokens.dtype)
    return jnp.einsum("bpn,bnd->bpd", attn, tokens)


def _awakening_prompt(
    p: Params, prefix: str, x: jax.Array, local_tokens: jax.Array, spec: ModelSpec,
    n_true: Optional[int] = None, rows_out: Optional[int] = None,
) -> jax.Array:
    """GPA module (ref: gaviko.py:121-187). ``n_true`` marks the real global
    stream length when it carries tail padding; pad rows are excluded from
    the cross-attention token sets (exact) and pass through proj_up in place.
    ``rows_out`` (last-layer fast path) emits only the first ``rows_out``
    output rows — the GPA's inputs always span the full streams, so this
    changes nothing but which rows pay the proj_up GEMM.
    """
    P = spec.num_prompts
    lat = spec.prompt_latent_dim
    n_true = x.shape[1] if n_true is None else n_true

    # One matmul for both streams (identical weights; concat is exact).
    both = quick_gelu(linear(
        p, f"{prefix}.proj_down.0",
        jnp.concatenate([x, local_tokens], axis=1),
    ))
    x_latent = both[:, : x.shape[1]]
    local_latent = both[:, x.shape[1]:]
    prompts_latent = x_latent[:, :P]
    cls_latent = x_latent[:, P:P + 1]
    global_img_latent = x_latent[:, P + 1:n_true]  # excludes tail padding

    # PromptRelevantEstimator: LN -> Linear(lat, 64) -> GELU -> Linear(64, P) -> Sigmoid
    ca = f"{prefix}.cls_analyzer.cls_analyzer_"
    h = layer_norm(p, f"{ca}.0", cls_latent)
    h = gelu(linear(p, f"{ca}.1", h))
    prompt_importance = jax.nn.sigmoid(linear(p, f"{ca}.3", h))  # [B, 1, P]

    # PromptContextFusion: LN -> Linear(lat, 1) -> Sigmoid
    gb = f"{prefix}.gl_balancer.gl_balancer_"
    g = jax.nn.sigmoid(linear(p, f"{gb}.1", layer_norm(p, f"{gb}.0", cls_latent)))  # [B,1,1]

    # Global path: query-proj prompts, attend over image latent [P+1:] (the
    # double-slice quirk).
    q_g = linear(p, f"{prefix}.global_attention.query_proj", prompts_latent)
    global_context = _fusion_cross_attention(q_g, global_img_latent[:, P + 1:], lat)
    # Local path: all local tokens.
    q_l = linear(p, f"{prefix}.local_attention.query_proj", prompts_latent)
    local_context = _fusion_cross_attention(q_l, local_latent, lat)

    fused = g * global_context + (1 - g) * local_context
    enhanced = fused * prompt_importance.transpose(0, 2, 1)  # [B, P, lat]

    parts = [enhanced, cls_latent, global_img_latent]
    if n_true != x.shape[1]:
        parts.append(x_latent[:, n_true:])  # pad rows ride along unscaled
    combined = jnp.concatenate(parts, axis=1)
    if rows_out is not None:
        combined = combined[:, :rows_out]
    return linear(p, f"{prefix}.proj_up", combined)


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    local_impl: Optional[str] = None,
) -> jax.Array:
    if local_impl is None:
        from gaviko_tpu.ops import attention as attn_mod

        local_impl = "flash" if attn_mod._DEFAULT_IMPL == "flash" else "xla"
    rngs = RngStream(rng)
    # Custom train() (gaviko.py:513-528): with freeze_vit the backbone
    # (global attns/mlps, conv, emb dropout) stays eval; local_attns,
    # prompt_projs and the head train.
    bb_train = train and not spec.freeze_vit
    local_train = train  # local_attns are .train()'d even when frozen ViT

    P = spec.num_prompts
    x = vit_core.patchify_embed(params, "conv_proj.0", img, spec)
    B = x.shape[0]
    dt = x.dtype

    cls = jnp.broadcast_to(params["cls_token"], (B, 1, spec.dim)).astype(dt)
    global_tokens = jnp.concatenate([cls, x], axis=1)
    prompts = jnp.broadcast_to(params["prompt_embeddings"], (B, P, spec.dim)).astype(dt)
    global_tokens = jnp.concatenate([prompts, global_tokens], axis=1)
    global_tokens = global_tokens + jnp.concatenate(
        [params["prompt_positional_embedding"], params["pos_embedding"]], axis=1
    ).astype(dt)
    global_tokens = dropout(global_tokens, spec.emb_dropout, bb_train, rngs)

    local_tokens = x + params["pos_embedding"][:, 1:, :].astype(dt)
    local_tokens = dropout(local_tokens, spec.emb_dropout, bb_train, rngs)

    # Pad the global stream ONCE to a tile-friendly length (P+1+N = 1033 ->
    # 1040 for the real config); attention masks keys >= n_true and the GPA
    # excludes pad rows from its token sets, so results are exact while the
    # per-layer qkv pad/slice copies disappear. The head reads rows [0, P+1)
    # only, so no final slice is needed.
    n_true = global_tokens.shape[1]
    g_pad = (-n_true) % 8
    if g_pad:
        global_tokens = jnp.pad(global_tokens, [(0, 0), (0, g_pad), (0, 0)])

    # Last-layer fast path: the head pools rows [0, P+1) only, and in the
    # final iteration nothing else consumes the MLP/GPA outputs (the GPA
    # reads the POST-ATTENTION stream, so the last global attention still
    # runs full-width) — so the last MLP, proj_up, and final LN shrink to
    # the pooled rows. Exact math in eval AND train (discarded rows carry
    # zero cotangents). GAVIKO_CLS_FAST=0 disables (same gate as core/vit).
    import os as _os
    fast_pool = _os.environ.get("GAVIKO_CLS_FAST", "1") == "1"  # GAViKO pools
    # prompts+CLS rather than spec.pool, so the env flag alone gates here.

    for i in range(spec.depth):
        last = fast_pool and i == spec.depth - 1
        j = i // spec.share_factor
        la = f"transformer.local_attns.{j}"
        local_tokens = _local_self_attention(
            params, la, local_tokens, spec, train=local_train, rngs=rngs,
            impl=local_impl,
        ) + local_tokens
        global_tokens = vit_core.attention_block(
            params, f"transformer.attns.{i}", global_tokens, spec,
            train=bb_train, rngs=rngs, n_true=n_true,
        ) + global_tokens
        prompt = _awakening_prompt(
            params, f"transformer.prompt_projs.{j}", global_tokens, local_tokens,
            spec, n_true=n_true, rows_out=P + 1 if last else None,
        )
        if last:
            rows = global_tokens[:, : P + 1]
            rows = vit_core.feedforward_block(
                params, f"transformer.mlps.{i}", rows, spec,
                train=bb_train, rngs=rngs,
            ) + rows + prompt
            out = layer_norm(params, "transformer.norm", rows)
            return linear(params, "mlp_head.head", out.mean(axis=1))
        global_tokens = vit_core.feedforward_block(
            params, f"transformer.mlps.{i}", global_tokens, spec,
            train=bb_train, rngs=rngs,
        ) + global_tokens + prompt

    out = layer_norm(params, "transformer.norm", global_tokens)
    # AdaptiveFusionHead: Prompt-CLS pool (gaviko.py:314-316).
    pooled = out[:, : P + 1].mean(axis=1)
    return linear(params, "mlp_head.head", pooled)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    dim, mlp, lat, ldim = spec.dim, spec.mlp_dim, spec.prompt_latent_dim, spec.local_dim
    inner = spec.heads * spec.dim_head
    P = spec.num_prompts
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    p: Params = {}
    p["conv_proj.0.weight"] = tinit.torch_conv3d_weight(kg(), dim, spec.channels, (pd, ph, pw), dtype)
    p["conv_proj.0.bias"] = tinit.torch_conv3d_bias(kg(), dim, spec.channels, (pd, ph, pw), dtype)
    p["pos_embedding"] = jax.random.normal(kg(), (1, spec.num_patches + 1, dim), dtype)
    p["cls_token"] = jax.random.normal(kg(), (1, 1, dim), dtype)

    for i in range(spec.depth):
        a = f"transformer.attns.{i}"
        p[f"{a}.norm.weight"] = jnp.ones((dim,), dtype)
        p[f"{a}.norm.bias"] = jnp.zeros((dim,), dtype)
        p[f"{a}.to_qkv.weight"] = tinit.torch_linear_weight(kg(), inner * 3, dim, dtype)
        p[f"{a}.to_out.0.weight"] = tinit.torch_linear_weight(kg(), dim, inner, dtype)
        p[f"{a}.to_out.0.bias"] = tinit.torch_linear_bias(kg(), dim, inner, dtype)
        f = f"transformer.mlps.{i}"
        p[f"{f}.net.0.weight"] = jnp.ones((dim,), dtype)
        p[f"{f}.net.0.bias"] = jnp.zeros((dim,), dtype)
        p[f"{f}.net.1.weight"] = tinit.torch_linear_weight(kg(), mlp, dim, dtype)
        p[f"{f}.net.1.bias"] = tinit.torch_linear_bias(kg(), mlp, dim, dtype)
        p[f"{f}.net.4.weight"] = tinit.torch_linear_weight(kg(), dim, mlp, dtype)
        p[f"{f}.net.4.bias"] = tinit.torch_linear_bias(kg(), dim, mlp, dtype)
    p["transformer.norm.weight"] = jnp.ones((dim,), dtype)
    p["transformer.norm.bias"] = jnp.zeros((dim,), dtype)

    for j in range(n_unique(spec)):
        la = f"transformer.local_attns.{j}"
        p[f"{la}.norm.weight"] = jnp.ones((dim,), dtype)
        p[f"{la}.norm.bias"] = jnp.zeros((dim,), dtype)
        # Custom init (gaviko.py:490-503): xavier gains, proj_down.bias zeroed
        # (twice), proj_up.bias left at torch default.
        p[f"{la}.proj_down.weight"] = tinit.xavier_uniform(kg(), (ldim, dim), gain=0.5, dtype=dtype)
        p[f"{la}.proj_down.bias"] = jnp.zeros((ldim,), dtype)
        p[f"{la}.qkv.weight"] = tinit.xavier_uniform(kg(), (ldim * 3, ldim), gain=1.0, dtype=dtype)
        p[f"{la}.proj_up.weight"] = tinit.xavier_uniform(kg(), (dim, ldim), gain=0.5, dtype=dtype)
        p[f"{la}.proj_up.bias"] = tinit.torch_linear_bias(kg(), dim, ldim, dtype)

        pp = f"transformer.prompt_projs.{j}"
        p[f"{pp}.proj_down.0.weight"] = tinit.xavier_uniform(kg(), (lat, dim), gain=0.7, dtype=dtype)
        p[f"{pp}.proj_down.0.bias"] = jnp.zeros((lat,), dtype)
        p[f"{pp}.proj_up.weight"] = tinit.xavier_uniform(kg(), (dim, lat), gain=0.7, dtype=dtype)
        p[f"{pp}.proj_up.bias"] = jnp.zeros((dim,), dtype)
        ca = f"{pp}.cls_analyzer.cls_analyzer_"
        p[f"{ca}.0.weight"] = jnp.ones((lat,), dtype)
        p[f"{ca}.0.bias"] = jnp.zeros((lat,), dtype)
        p[f"{ca}.1.weight"] = tinit.xavier_uniform(kg(), (64, lat), gain=1.0, dtype=dtype)
        p[f"{ca}.1.bias"] = jnp.zeros((64,), dtype)
        p[f"{ca}.3.weight"] = tinit.xavier_uniform(kg(), (P, 64), gain=1.0, dtype=dtype)
        p[f"{ca}.3.bias"] = jnp.zeros((P,), dtype)
        gb = f"{pp}.gl_balancer.gl_balancer_"
        p[f"{gb}.0.weight"] = jnp.ones((lat,), dtype)
        p[f"{gb}.0.bias"] = jnp.zeros((lat,), dtype)
        p[f"{gb}.1.weight"] = tinit.xavier_uniform(kg(), (1, lat), gain=1.0, dtype=dtype)
        # Bias 0.5 -> sigmoid ~0.62 global at start (gaviko.py:487).
        p[f"{gb}.1.bias"] = 0.5 * jnp.ones((1,), dtype)
        p[f"{pp}.global_attention.query_proj.weight"] = tinit.orthogonal(kg(), (lat, lat), dtype=dtype)
        p[f"{pp}.global_attention.query_proj.bias"] = jnp.zeros((lat,), dtype)
        p[f"{pp}.local_attention.query_proj.weight"] = tinit.orthogonal(kg(), (lat, lat), dtype=dtype)
        p[f"{pp}.local_attention.query_proj.bias"] = jnp.zeros((lat,), dtype)

    # Prompt tables (gaviko.py:421-423, 449-461): trunc-normal std .02 clamped
    # +-2 std; pos-emb normal std .01 (unclamped).
    p["prompt_embeddings"] = tinit.trunc_normal(kg(), (1, P, dim), std=0.02, dtype=dtype)
    p["prompt_positional_embedding"] = 0.01 * jax.random.normal(kg(), (1, P, dim), dtype)

    p["mlp_head.head.weight"] = tinit.xavier_uniform(kg(), (spec.num_classes, dim), dtype=dtype)
    p["mlp_head.head.bias"] = jnp.zeros((spec.num_classes,), dtype)

    # Alias entries mirroring torch's duplicated state_dict rows. They must
    # be COPIES: the canonical entries are trainable and get donated by the
    # jitted train step, which would delete a shared buffer out from under
    # the frozen alias.
    for alias, canon in aliases(spec).items():
        p[alias] = jnp.array(p[canon])
    return p
