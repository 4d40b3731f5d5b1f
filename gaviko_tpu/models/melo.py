"""MeLO — LoRA on q and v of every attention qkv projection.

Reference: src/model/melo.py. The wrapped ViT is fully frozen; each selected
layer's ``to_qkv`` becomes qkv(x) with rank-r deltas added to the q and v
thirds, scaled by ``alpha // r`` (integer division — melo.py:45-46); the head
is replaced with a fresh Linear (melo.py:90-91). Param names carry the
reference's ``lora_vit.`` prefix and the nested ``to_qkv.qkv`` layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.config import ModelSpec
from gaviko_tpu.core import init as tinit
from gaviko_tpu.core import vit as vit_core
from gaviko_tpu.core.layers import Params, RngStream, dropout, layer_norm, linear


def _lora_layers(spec: ModelSpec):
    return spec.lora_layers if spec.lora_layers is not None else tuple(range(spec.depth))


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rngs = RngStream(rng)
    # MeLO defines no custom train(): in training mode every dropout of the
    # frozen backbone is live, like the reference.
    vt = {k[len("lora_vit."):]: v for k, v in params.items() if k.startswith("lora_vit.")}
    lora = set(_lora_layers(spec))
    scaling = spec.alpha // spec.r  # integer division, as in the reference

    x = vit_core.patchify_embed(vt, "conv_proj.0", img, spec)
    x = vit_core.add_cls_and_pos(vt, x)
    x = dropout(x, spec.emb_dropout, train, rngs)
    n_true = x.shape[1]
    pad = (-n_true) % 8
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    fast = vit_core.cls_fast_enabled(spec)
    for i in range(spec.depth):
        a = f"transformer.layers.{i}.0"
        if fast and i == spec.depth - 1:
            # Last-layer fast path (core/vit.py cls_fast_enabled): the head
            # pools row 0 only. K/V (with the LoRA v-delta) still span all
            # rows; Q (with its q-delta) is computed for the CLS row alone.
            xn = layer_norm(vt, f"{a}.norm", x)
            if i in lora:
                qp = f"{a}.to_qkv"
                w = vt[f"{qp}.qkv.weight"]
                dim = w.shape[1]
                kv = xn @ w[dim:].T
                dv = scaling * ((xn @ vt[f"{qp}.linear_a_v.weight"].T)
                                @ vt[f"{qp}.linear_b_v.weight"].T)
                kv = jnp.concatenate(
                    [kv[..., :dim], kv[..., dim:] + dv], axis=-1)
                x0 = xn[:, 0]
                q0 = x0 @ w[:dim].T + scaling * (
                    (x0 @ vt[f"{qp}.linear_a_q.weight"].T)
                    @ vt[f"{qp}.linear_b_q.weight"].T)
            else:
                w = vt[f"{a}.to_qkv.weight"]
                dim = w.shape[1]
                kv = xn @ w[dim:].T
                q0 = xn[:, 0] @ w[:dim].T
            out = vit_core.cls_attend(kv, q0, spec, n_true=n_true,
                                      train=train, rngs=rngs)
            out = linear(vt, f"{a}.to_out.0", out.astype(x.dtype))
            out = dropout(out, spec.dropout, train, rngs)
            c = x[:, 0] + out
            c = c + vit_core.feedforward_cls_branch(
                vt, f"transformer.layers.{i}.1", c, spec, train=train,
                rngs=rngs,
            )
            return linear(
                vt, "mlp_head", layer_norm(vt, "transformer.norm", c))
        if i in lora:
            qkv_prefix = f"{a}.to_qkv"

            def qkv_override(h, qp=qkv_prefix):
                qkv = h @ vt[f"{qp}.qkv.weight"].T
                new_q = (h @ vt[f"{qp}.linear_a_q.weight"].T) @ vt[f"{qp}.linear_b_q.weight"].T
                new_v = (h @ vt[f"{qp}.linear_a_v.weight"].T) @ vt[f"{qp}.linear_b_v.weight"].T
                dim = vt[f"{qp}.qkv.weight"].shape[1]
                q = qkv[..., :dim] + scaling * new_q
                k = qkv[..., dim:-dim]
                v = qkv[..., -dim:] + scaling * new_v
                return jnp.concatenate([q, k, v], axis=-1)

            x = vit_core.attention_block(
                vt, a, x, spec, train=train, rngs=rngs,
                qkv_override=qkv_override, n_true=n_true,
            ) + x
        else:
            # Un-adapted layers keep the plain name (to_qkv.weight).
            x = vit_core.attention_block(
                vt, a, x, spec, train=train, rngs=rngs, n_true=n_true
            ) + x
        x = vit_core.feedforward_block(
            vt, f"transformer.layers.{i}.1", x, spec, train=train, rngs=rngs
        ) + x
    if pad:
        x = x[:, :n_true]
    x = layer_norm(vt, "transformer.norm", x)
    return vit_core.pool_and_head(vt, x, spec)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    base = vit_core.vit_init(kg(), spec, dtype)
    lora = set(_lora_layers(spec))
    p: Params = {}
    for k, v in base.items():
        nk = k
        for i in lora:
            if k == f"transformer.layers.{i}.0.to_qkv.weight":
                nk = f"transformer.layers.{i}.0.to_qkv.qkv.weight"
        p[f"lora_vit.{nk}"] = v
    dim, r = spec.dim, spec.r
    for i in lora:
        qp = f"lora_vit.transformer.layers.{i}.0.to_qkv"
        for ab in ("q", "v"):
            p[f"{qp}.linear_a_{ab}.weight"] = tinit.kaiming_uniform(
                kg(), (r, dim), fan_in=dim, dtype=dtype
            )
            p[f"{qp}.linear_b_{ab}.weight"] = jnp.zeros((dim, r), dtype)
    # Fresh replacement head keeps torch-default Linear init (melo.py:90-91).
    p["lora_vit.mlp_head.weight"] = tinit.torch_linear_weight(kg(), spec.num_classes, dim, dtype)
    p["lora_vit.mlp_head.bias"] = tinit.torch_linear_bias(kg(), spec.num_classes, dim, dtype)
    return p
