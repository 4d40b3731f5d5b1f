"""VPT — shallow & deep visual prompt tuning over a wrapped plain ViT.

Reference: src/model/vpt.py (PromptedVisionTransformer). Prompts live in a
``prompt_dim`` (default 64) space and are projected up by ``prompt_proj``.
Shallow: prompts inserted once after cls, all layers run (vpt.py:124-140).
Deep: layer 0 inserts; layers >= 1 splice in fresh prompts while dropping the
tokens at positions [1, 1 + prompt_dim) — the reference indexes
``deep_prompt_embeddings[i].shape[1]`` which is PROMPT_DIM, not num_prompts
(vpt.py:153), so with prompt_dim=64 > num_prompts=8 the sequence SHRINKS by
56 tokens per deep layer. Reproduced bit-for-bit (reproduce-or-flag defect;
parity-checked in tests/test_parity_methods.py).

Param names use the reference's ``vision_transformer.`` prefix for the inner
ViT so trainable-only checkpoints interoperate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.config import ModelSpec
from gaviko_tpu.core import init as tinit
from gaviko_tpu.core import vit as vit_core
from gaviko_tpu.core.layers import Params, RngStream, dropout, layer_norm, linear


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rngs = RngStream(rng)
    # Custom train(): when freeze_vit, inner transformer/conv/emb-dropout stay
    # in eval mode; prompt_dropout and the head stay in train mode
    # (ref: vpt.py:106-119).
    bb_train = train and not spec.freeze_vit
    prompt_train = train

    vt = {k[len("vision_transformer."):]: v for k, v in params.items()
          if k.startswith("vision_transformer.")}

    x = vit_core.patchify_embed(vt, "conv_proj.0", img, spec)
    x = vit_core.add_cls_and_pos(vt, x)
    x = dropout(x, spec.emb_dropout, bb_train, rngs)

    B = x.shape[0]
    P = spec.num_prompts

    def project_prompts(emb):  # [P, prompt_dim] or [1, P, prompt_dim]
        pr = linear(params, "prompt_proj", emb)
        pr = jnp.broadcast_to(pr.reshape(1, P, -1), (B, P, pr.shape[-1])).astype(x.dtype)
        return dropout(pr, spec.prompt_dropout, prompt_train, rngs)

    # Last-layer fast path (see core/vit.py cls_fast_enabled): the head
    # pools row 0 only, so the final layer runs CLS-query-only — exact in
    # eval and train (discarded rows carry zero cotangents).
    fast = vit_core.cls_fast_enabled(spec)

    def last_layer_cls(x, i):
        c = x[:, 0] + vit_core.attention_cls_branch(
            vt, f"transformer.layers.{i}.0", x, spec, n_true=x.shape[1],
            train=bb_train, rngs=rngs,
        )
        c = c + vit_core.feedforward_cls_branch(
            vt, f"transformer.layers.{i}.1", c, spec, train=bb_train,
            rngs=rngs,
        )
        return linear(vt, "mlp_head", layer_norm(vt, "transformer.norm", c))

    if spec.deep_prompt:
        table = params["deep_prompt_embeddings"]  # (layers, P, prompt_dim)
        for i in range(spec.depth):
            pr = project_prompts(table[i])
            if i == 0:
                x = jnp.concatenate([x[:, :1], pr, x[:, 1:]], axis=1)
            else:
                # NOT 1 + P: the reference drops 1 + prompt_dim positions.
                x = jnp.concatenate([x[:, :1], pr, x[:, 1 + spec.prompt_dim:]], axis=1)
            if fast and i == spec.depth - 1:
                return last_layer_cls(x, i)
            x = vit_core.attention_block(
                vt, f"transformer.layers.{i}.0", x, spec, train=bb_train, rngs=rngs
            ) + x
            x = vit_core.feedforward_block(
                vt, f"transformer.layers.{i}.1", x, spec, train=bb_train, rngs=rngs
            ) + x
    else:
        pr = project_prompts(params["prompt_embeddings"][0])
        x = jnp.concatenate([x[:, :1], pr, x[:, 1:]], axis=1)
        for i in range(spec.depth):
            if fast and i == spec.depth - 1:
                return last_layer_cls(x, i)
            x = vit_core.attention_block(
                vt, f"transformer.layers.{i}.0", x, spec, train=bb_train, rngs=rngs
            ) + x
            x = vit_core.feedforward_block(
                vt, f"transformer.layers.{i}.1", x, spec, train=bb_train, rngs=rngs
            ) + x

    x = layer_norm(vt, "transformer.norm", x)
    pooled = x.mean(axis=1) if spec.pool == "mean" else x[:, 0]
    return linear(vt, "mlp_head", pooled)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    inner = vit_core.vit_init(kg(), spec, dtype)
    p: Params = {f"vision_transformer.{k}": v for k, v in inner.items()}
    p["prompt_proj.weight"] = tinit.xavier_uniform(kg(), (spec.dim, spec.prompt_dim), dtype=dtype)
    p["prompt_proj.bias"] = jnp.zeros((spec.dim,), dtype)
    if spec.deep_prompt:
        p["deep_prompt_embeddings"] = tinit.xavier_uniform(
            kg(), (spec.depth, spec.num_prompts, spec.prompt_dim), dtype=dtype
        )
    else:
        p["prompt_embeddings"] = tinit.xavier_uniform(
            kg(), (1, spec.num_prompts, spec.prompt_dim), dtype=dtype
        )
    # init_head_weights (vpt.py:96-99) re-inits the inner ViT head.
    p["vision_transformer.mlp_head.weight"] = tinit.xavier_uniform(
        kg(), (spec.num_classes, spec.dim), dtype=dtype
    )
    p["vision_transformer.mlp_head.bias"] = jnp.zeros((spec.num_classes,), dtype)
    return p
