"""DVPT — dynamic visual prompt tuning with a gated shared-MLP prompt refresher.

Reference: src/model/dvpt.py. 50 prompt tokens + prompt pos-emb are prepended
at the input (dvpt.py:187-198). Each block runs
``x = attn(x) + x; prompt = share_MLP(x); x = mlp(x) + x + prompt``
(dvpt.py:59-63) where share_MLP is QuickGELU -> Linear(dim->20) -> prompt/cls/
token split -> prompt->token softmax cross-attn (scaled by dim**-0.5, the
FULL model dim — dvpt.py:36) -> concat -> Linear(20->dim) * prompt_gate
(init 0, so the refresher starts contributing nothing).

Pool quirk (dvpt.py:77-83): the transformer returns norm(x) when pool=='cls'
but norm(x[:, :P+1]) otherwise; the config uses pool='mean', so the head sees
the mean over prompts+cls only.

Layer names: ``transformer.layers.{i}.0.{attn,mlp,prompt_proj}``.
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
    layer_norm,
    linear,
    quick_gelu,
)

SHARE_MLP_LATENT = 20  # share_MLP ctor constant (dvpt.py:28)


def _share_mlp(p: Params, prefix: str, x: jax.Array, spec: ModelSpec) -> jax.Array:
    P = spec.num_prompts
    h = linear(p, f"{prefix}.prompt_key_proj_d", quick_gelu(x))  # [B, P+1+N, 20]
    prompt = h[:, :P]
    cls = h[:, P:P + 1]
    tokens = h[:, P + 1:]
    scale = spec.dim ** -0.5  # full model dim, not the latent dim
    dots = jnp.einsum(
        "bpd,bnd->bpn", prompt, tokens, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(h.dtype)
    out = jnp.einsum("bpn,bnd->bpd", attn, tokens)
    out = jnp.concatenate([out, cls, tokens], axis=1)
    return linear(p, f"{prefix}.prompt_key_proj_u", out) * p[f"{prefix}.prompt_gate"]


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rngs = RngStream(rng)
    # Custom train() (dvpt.py:168-183): frozen backbone eval; prompt_proj and
    # head train (neither has dropout).
    bb_train = train and not spec.freeze_vit

    x = vit_core.patchify_embed(params, "conv_proj.0", img, spec)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, spec.dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    prompts = jnp.broadcast_to(
        params["prompt_embeddings"], (B, spec.num_prompts, spec.dim)
    ).astype(x.dtype)
    x = jnp.concatenate([prompts, x], axis=1)
    pos = jnp.concatenate(
        [params["prompt_positional_embedding"], params["pos_embedding"]], axis=1
    ).astype(x.dtype)
    x = x + pos
    x = dropout(x, spec.emb_dropout, bb_train, rngs)

    for i in range(spec.depth):
        blk = f"transformer.layers.{i}.0"
        x = vit_core.attention_block(
            params, f"{blk}.attn", x, spec, train=bb_train, rngs=rngs
        ) + x
        prompt = _share_mlp(params, f"{blk}.prompt_proj", x, spec)
        x = vit_core.feedforward_block(
            params, f"{blk}.mlp", x, spec, train=bb_train, rngs=rngs
        ) + x + prompt

    # Transformer pool quirk (dvpt.py:77-83).
    if spec.pool == "cls":
        x = layer_norm(params, "transformer.norm", x)
    else:
        x = layer_norm(params, "transformer.norm", x[:, : spec.num_prompts + 1])
    pooled = x.mean(axis=1) if spec.pool == "mean" else x[:, 0]
    return linear(params, "mlp_head", pooled)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    base = vit_core.vit_init(kg(), spec, dtype)
    p: Params = {}
    for k, v in base.items():
        # ResidualAttentionBlock nests attn/mlp under slot 0 with named attrs.
        k = k.replace(".0.norm.", ".0.attn.norm.")
        k = k.replace(".0.to_qkv.", ".0.attn.to_qkv.")
        k = k.replace(".0.to_out.", ".0.attn.to_out.")
        k = k.replace(".1.net.", ".0.mlp.net.")
        p[k] = v
    dim, lat = spec.dim, SHARE_MLP_LATENT
    for i in range(spec.depth):
        s = f"transformer.layers.{i}.0.prompt_proj"
        p[f"{s}.prompt_key_proj_d.weight"] = tinit.torch_linear_weight(kg(), lat, dim, dtype)
        p[f"{s}.prompt_key_proj_d.bias"] = tinit.torch_linear_bias(kg(), lat, dim, dtype)
        p[f"{s}.prompt_key_proj_u.weight"] = tinit.torch_linear_weight(kg(), dim, lat, dtype)
        p[f"{s}.prompt_key_proj_u.bias"] = tinit.torch_linear_bias(kg(), dim, lat, dtype)
        p[f"{s}.prompt_gate"] = jnp.zeros((1,), dtype)
    scale = dim ** -0.5
    p["prompt_positional_embedding"] = scale * jax.random.normal(
        kg(), (1, spec.num_prompts, dim), dtype
    )
    p["prompt_embeddings"] = jax.random.normal(kg(), (1, spec.num_prompts, dim), dtype)
    # init_head_weights (dvpt.py:163-166)
    p["mlp_head.weight"] = tinit.xavier_uniform(kg(), (spec.num_classes, dim), dtype=dtype)
    p["mlp_head.bias"] = jnp.zeros((spec.num_classes,), dtype)
    return p
