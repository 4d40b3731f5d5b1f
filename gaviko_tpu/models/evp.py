"""EVP — explicit visual prompting from high-pass-FFT handcrafted features.

Reference: src/model/evp.py. Two feature streams feed a per-depth prompt:
- ``init_embeddings``: the patch-embed output projected dim -> dim/scale
  (evp.py:72-75);
- ``init_handcrafted``: a high-pass FFT of the raw volume through a separate
  patch embed at dim/scale (evp.py:77-79, 126-147).
``get_prompt`` runs a per-depth Linear+GELU on (handcrafted + embedding) and
a shared up-projection (evp.py:81-90). Each transformer layer ADDS prompt[i]
to the non-cls tokens before attention (evp.py:231-240).

Reproduced reference defects (reproduce-or-flag, SURVEY.md §7):
- the FFT mask indexes dims (2, 3) = (D, H) with extents computed from the
  last two dims (H, W) (evp.py:129-132);
- torch.fft.fftshift/ifftshift default to ALL axes (including batch), which
  jnp matches;
- ``PromptGenerator.forward`` (evp.py:92-124) is dead code and has no
  equivalent here; ``init_head_weights`` is never invoked, so the head keeps
  torch-default init.

Note the patch embed here is the reference's own PatchEmbed class, so conv
params are named ``conv_proj.proj.*`` (evp.py:288), unlike the other models'
``conv_proj.0.*``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.config import ModelSpec
from gaviko_tpu.core import init as tinit
from gaviko_tpu.core import vit as vit_core
from gaviko_tpu.core.layers import Params, RngStream, dropout, gelu, layer_norm, linear


def fft_highpass(x: jax.Array, rate: float) -> jax.Array:
    """High-pass filter in the (shifted) frequency domain (ref: evp.py:126-147)."""
    w, h = x.shape[-2], x.shape[-1]
    line = int((w * h * rate) ** 0.5 // 2)
    mask = jnp.zeros(x.shape, dtype=x.dtype)
    # Reference quirk: dims 2 and 3 (D, H for a 5D volume), extents from (H, W).
    mask = mask.at[:, :, w // 2 - line : w // 2 + line, h // 2 - line : h // 2 + line].set(1.0)
    f = jnp.fft.fftshift(jnp.fft.fft2(x, norm="forward"))  # fftshift over ALL axes
    f = f * (1 - mask)
    f = jnp.fft.ifftshift(f)
    inv = jnp.fft.ifft2(f, norm="forward").real
    return jnp.abs(inv)


def _patch_embed_conv(p: Params, prefix: str, img: jax.Array, spec: ModelSpec) -> jax.Array:
    """PatchEmbed conv (kernel == stride) -> [B, N, out_dim] tokens, same
    reshape+GEMM lowering as the core patchify."""
    from gaviko_tpu.ops import attention as attn_mod
    from gaviko_tpu.ops.patchify import patchify_fused, patchify_supported

    if attn_mod._DEFAULT_IMPL == "flash" and patchify_supported(spec):
        import jax.numpy as _jnp

        w = p[f"{prefix}.weight"]
        zeros = _jnp.zeros((spec.num_patches, w.shape[0]), img.dtype)
        return patchify_fused(img, w, p[f"{prefix}.bias"], zeros, spec)
    B, C, D, H, W = img.shape
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    gd, gh, gw = D // pd, H // ph, W // pw
    x = img.reshape(B, C, gd, pd, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, gd * gh * gw, C * pd * ph * pw)
    w = p[f"{prefix}.weight"]
    y = jnp.einsum(
        "bnk,dk->bnd", x, w.reshape(w.shape[0], -1),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p[f"{prefix}.bias"]


def apply(
    params: Params,
    img: jax.Array,
    spec: ModelSpec,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    rngs = RngStream(rng)
    # Custom train() (evp.py:334-347): frozen backbone eval; prompt_generator
    # + head train (neither carries dropout).
    bb_train = train and not spec.freeze_vit

    # Backbone patch embed: [B, N, dim] (token order matches flatten(2).T).
    x = _patch_embed_conv(params, "conv_proj.proj", img, spec)

    # Prompt generator.
    emb_feature = linear(params, "prompt_generator.embedding_generator", x)
    hand = fft_highpass(img, spec.freq_nums)
    hand_feature = _patch_embed_conv(
        params, "prompt_generator.prompt_generator.proj", hand, spec
    )
    prompts = []
    base = hand_feature + emb_feature
    for i in range(spec.depth):
        h = linear(params, f"prompt_generator.lightweight_mlp_{i}.0", base)
        h = gelu(h)
        prompts.append(linear(params, "prompt_generator.shared_mlp", h))

    x = vit_core.add_cls_and_pos(params, x)
    x = dropout(x, spec.emb_dropout, bb_train, rngs)
    fast = vit_core.cls_fast_enabled(spec)
    for i in range(spec.depth):
        x = jnp.concatenate([x[:, :1], prompts[i] + x[:, 1:]], axis=1)
        if fast and i == spec.depth - 1:
            # Last-layer fast path (core/vit.py cls_fast_enabled).
            c = x[:, 0] + vit_core.attention_cls_branch(
                params, f"transformer.layers.{i}.0", x, spec,
                n_true=x.shape[1], train=bb_train, rngs=rngs)
            c = c + vit_core.feedforward_cls_branch(
                params, f"transformer.layers.{i}.1", c, spec,
                train=bb_train, rngs=rngs)
            return linear(
                params, "mlp_head", layer_norm(params, "transformer.norm", c))
        x = vit_core.attention_block(
            params, f"transformer.layers.{i}.0", x, spec, train=bb_train, rngs=rngs
        ) + x
        x = vit_core.feedforward_block(
            params, f"transformer.layers.{i}.1", x, spec, train=bb_train, rngs=rngs
        ) + x
    x = layer_norm(params, "transformer.norm", x)
    return vit_core.pool_and_head(params, x, spec)


def init(rng: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> Params:
    kg = tinit.KeyGen(rng)
    base = vit_core.vit_init(kg(), spec, dtype)
    p: Params = {}
    for k, v in base.items():
        # EVP's patch embed is PatchEmbed(proj=Conv3d), not Sequential.
        k = k.replace("conv_proj.0.", "conv_proj.proj.")
        p[k] = v
    dim = spec.dim
    low = dim // spec.scale_factor
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    # PromptGenerator Linears use timm-style trunc_normal(std=.02), zero bias
    # (evp.py:57-64); the Conv3d keeps torch default (the _init_weights hook
    # only handles Conv2d).
    p["prompt_generator.shared_mlp.weight"] = tinit.timm_style_trunc_normal(
        kg(), (dim, low), dtype=dtype
    )
    p["prompt_generator.shared_mlp.bias"] = jnp.zeros((dim,), dtype)
    p["prompt_generator.embedding_generator.weight"] = tinit.timm_style_trunc_normal(
        kg(), (low, dim), dtype=dtype
    )
    p["prompt_generator.embedding_generator.bias"] = jnp.zeros((low,), dtype)
    for i in range(spec.depth):
        p[f"prompt_generator.lightweight_mlp_{i}.0.weight"] = tinit.timm_style_trunc_normal(
            kg(), (low, low), dtype=dtype
        )
        p[f"prompt_generator.lightweight_mlp_{i}.0.bias"] = jnp.zeros((low,), dtype)
    p["prompt_generator.prompt_generator.proj.weight"] = tinit.torch_conv3d_weight(
        kg(), low, spec.channels, (pd, ph, pw), dtype
    )
    p["prompt_generator.prompt_generator.proj.bias"] = tinit.torch_conv3d_bias(
        kg(), low, spec.channels, (pd, ph, pw), dtype
    )
    return p
