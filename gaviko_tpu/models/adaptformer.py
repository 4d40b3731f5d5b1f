"""AdaptFormer — parallel bottleneck adapters alongside each MLP block.

Reference: src/model/adaptformer.py. Per block:
``x = attn(x) + x; residual = adapter(x); x = ff(x) + x + residual``
(adaptformer.py:93-98). The adapter is LN('in') -> down Linear(dim->64) ->
ReLU -> dropout(p=0, functional) -> up Linear(64->dim) -> * scale
(adaptformer.py:58-78; LoRA-style init: kaiming down, zeros up, 49-56).
Layer param names: ``transformer.layers.{i}.{0,1,2}`` = attn, adapter, ff.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.config import ModelSpec
from gaviko_tpu.core import init as tinit
from gaviko_tpu.core import vit as vit_core
from gaviko_tpu.core.layers import Params, RngStream, dropout, layer_norm, linear

ADAPTER_DOWN_DIM = 64  # Adapter ctor default (adaptformer.py:24); config never overrides


def _adapter(p: Params, prefix: str, x: jax.Array) -> jax.Array:
    h = layer_norm(p, f"{prefix}.adapter_layer_norm_before", x)  # option 'in'
    h = linear(p, f"{prefix}.down_adapter_proj", h)
    h = jax.nn.relu(h)
    # functional dropout with p=0.0 (adapter default) — a no-op; the scale is
    # the non-learnable float "1.0" in every config.
    h = linear(p, f"{prefix}.up_adapter_proj", h)
    return h


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rngs = RngStream(rng)
    # Custom train() (adaptformer.py:176-191): frozen backbone stays eval;
    # adapters + head train (adapters have no active dropout anyway).
    bb_train = train and not spec.freeze_vit

    x = vit_core.patchify_embed(params, "conv_proj.0", img, spec)
    x = vit_core.add_cls_and_pos(params, x)
    x = dropout(x, spec.emb_dropout, bb_train, rngs)
    # One-time tile pad (adapter/MLP are per-row, so pad rows are inert).
    n_true = x.shape[1]
    pad = (-n_true) % 8
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    fast = vit_core.cls_fast_enabled(spec)
    for i in range(spec.depth):
        if fast and i == spec.depth - 1:
            # Last-layer fast path: the head pools row 0 only; the adapter
            # is per-row, so it follows the CLS row through (exact math,
            # see core/vit.py cls_fast_enabled).
            c = x[:, 0] + vit_core.attention_cls_branch(
                params, f"transformer.layers.{i}.0", x, spec, n_true=n_true,
                train=bb_train, rngs=rngs,
            )
            residual = _adapter(params, f"transformer.layers.{i}.1", c)
            c = vit_core.feedforward_cls_branch(
                params, f"transformer.layers.{i}.2", c, spec, train=bb_train,
                rngs=rngs,
            ) + c + residual
            return linear(
                params, "mlp_head", layer_norm(params, "transformer.norm", c)
            )
        x = vit_core.attention_block(
            params, f"transformer.layers.{i}.0", x, spec, train=bb_train,
            rngs=rngs, n_true=n_true,
        ) + x
        residual = _adapter(params, f"transformer.layers.{i}.1", x)
        x = vit_core.feedforward_block(
            params, f"transformer.layers.{i}.2", x, spec, train=bb_train, rngs=rngs
        ) + x + residual
    if pad:
        x = x[:, :n_true]
    x = layer_norm(params, "transformer.norm", x)
    return vit_core.pool_and_head(params, x, spec)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    base = vit_core.vit_init(kg(), spec, dtype)
    p: Params = {}
    for k, v in base.items():
        # ff moves from slot 1 to slot 2 (the adapter takes slot 1).
        if ".1.net." in k:
            k = k.replace(".1.net.", ".2.net.")
        p[k] = v
    dim, dd = spec.dim, ADAPTER_DOWN_DIM
    for i in range(spec.depth):
        a = f"transformer.layers.{i}.1"
        p[f"{a}.adapter_layer_norm_before.weight"] = jnp.ones((dim,), dtype)
        p[f"{a}.adapter_layer_norm_before.bias"] = jnp.zeros((dim,), dtype)
        p[f"{a}.down_adapter_proj.weight"] = tinit.kaiming_uniform(
            kg(), (dd, dim), fan_in=dim, dtype=dtype
        )
        p[f"{a}.down_adapter_proj.bias"] = jnp.zeros((dd,), dtype)
        p[f"{a}.up_adapter_proj.weight"] = jnp.zeros((dim, dd), dtype)
        p[f"{a}.up_adapter_proj.bias"] = jnp.zeros((dim,), dtype)
    # init_head_weights (adaptformer.py:171-174)
    p["mlp_head.weight"] = tinit.xavier_uniform(kg(), (spec.num_classes, dim), dtype=dtype)
    p["mlp_head.bias"] = jnp.zeros((spec.num_classes,), dtype)
    return p
