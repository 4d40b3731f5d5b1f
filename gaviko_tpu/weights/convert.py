"""timm -> GAViKO-name weight conversion (the parity-critical path).

Replicates src/utils/load_pretrained.py:8-99 exactly:
- key remap: blocks.N.norm1/attn.qkv/attn.proj -> transformer.attns.N.{norm,
  to_qkv,to_out.0}; blocks.N.norm2/mlp.fc1/fc2 -> transformer.mlps.N.{net.0,
  net.1,net.4}; patch_embed.proj -> conv_proj.0 (with kernel inflation);
  pos_embed -> pos_embedding (2D->3D trilinear); norm.* -> transformer.norm.*.
- pos-embed interpolation: 14x14 grid -> cbrt(num_patches)^3 via trilinear,
  align_corners=False, cls row passed through (load_pretrained.py:34-44).
- patch-kernel inflation: mean over RGB -> repeat over depth
  (load_pretrained.py:46-51).

Intentionally preserved silent-drop behaviors (SURVEY.md §3.5): the emitted
``...to_qkv.bias`` keys have no destination param (reference Attention uses
bias=False), and the ``transformer.attns/mlps`` names only match GAViKO's
layout — both are dropped at load time by state_dict.load_state_dict's
name-intersection, exactly like torch strict=False.

No network in this environment: ``load_pretrain`` consumes a local timm-format
state dict (.pt via torch, or .npz) instead of downloading.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np

TIMM_MODEL_NAMES = {
    "vit-b16": "vit_base_patch16_224_in21k",
    "vit-t16": "vit_tiny_patch16_224_in21k",
    "vit-s16": "vit_small_patch16_224_in21k",
    "vit-l16": "vit_large_patch16_224_in21k",
}


def _linterp_axis(x: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    """1D linear resample along ``axis`` with torch align_corners=False
    semantics (half-pixel centers, border clamp)."""
    in_size = x.shape[axis]
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    w = (src - i0).astype(x.dtype)
    i0c = np.clip(i0, 0, in_size - 1)
    i1c = np.clip(i0 + 1, 0, in_size - 1)
    a = np.take(x, i0c, axis=axis)
    b = np.take(x, i1c, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return a * (1 - w) + b * w


def trilinear_resize(x: np.ndarray, out_dhw) -> np.ndarray:
    """[.., D, H, W] -> [.., D', H', W'], matching F.interpolate(trilinear,
    align_corners=False) — separable linear resampling."""
    nd = x.ndim
    for axis, size in zip((nd - 3, nd - 2, nd - 1), out_dhw):
        x = _linterp_axis(x, axis, size)
    return x


def interpolate_pos_embedding(pos_embed: np.ndarray, num_patches: int) -> np.ndarray:
    """(1, 1+P_old, dim) -> (1, 1+num_patches, dim) (ref: load_pretrained.py:34-44)."""
    cls_tok = pos_embed[:, :1, :]
    grid = pos_embed[:, 1:, :]
    old = int(grid.shape[1] ** 0.5)
    new = round(num_patches ** (1.0 / 3.0))
    g = grid.reshape(1, old, old, -1).transpose(0, 3, 1, 2)  # [1, dim, 14, 14]
    g = g[:, :, None, :, :]  # [1, dim, 1, 14, 14]
    g = trilinear_resize(g, (new, new, new))  # [1, dim, n, n, n]
    g = g.transpose(0, 2, 3, 4, 1).reshape(1, new ** 3, -1)
    return np.concatenate([cls_tok, g], axis=1)


def mean_kernel(patch_emb_weight: np.ndarray, depth_dim: int) -> np.ndarray:
    """(dim, 3, 16, 16) -> (dim, 1, depth, 16, 16) (ref: load_pretrained.py:46-51)."""
    w = patch_emb_weight.mean(axis=1, keepdims=True)  # mean over RGB
    w = np.repeat(w[:, :, None, :, :], depth_dim, axis=2)
    return w


def convert_timm_state(
    timm_state: Mapping[str, np.ndarray], num_patches: int, depth_dim: int
) -> Dict[str, np.ndarray]:
    """The per-key remap loop (ref: load_pretrained.py:63-98)."""
    new: Dict[str, np.ndarray] = {}

    def add(key, value, kind="plain"):
        repl = {
            "plain": "transformer",
            "attn": "transformer.attns",
            "mlp": "transformer.mlps",
        }[kind]
        new[key.replace("blocks", repl)] = np.asarray(value)

    for key, value in timm_state.items():
        value = np.asarray(value)
        if key == "cls_token":
            new[key] = value
        elif "norm1" in key:
            add(key.replace("norm1", "norm"), value, "attn")
        elif "attn.qkv" in key:
            # Emits to_qkv.bias too; dropped downstream (no destination).
            add(key.replace("attn.qkv", "to_qkv"), value, "attn")
        elif "attn.proj" in key:
            add(key.replace("attn.proj", "to_out.0"), value, "attn")
        elif "norm2" in key:
            add(key.replace("norm2", "net.0"), value, "mlp")
        elif "mlp.fc1" in key:
            add(key.replace("mlp.fc1", "net.1"), value, "mlp")
        elif "mlp.fc2" in key:
            add(key.replace("mlp.fc2", "net.4"), value, "mlp")
        elif "patch_embed.proj.weight" in key:
            add(
                key.replace("patch_embed.proj.weight", "conv_proj.0.weight"),
                mean_kernel(value, depth_dim),
            )
        elif "patch_embed.proj.bias" in key:
            add(key.replace("patch_embed.proj.bias", "conv_proj.0.bias"), value)
        elif key == "pos_embed":
            add("pos_embedding", interpolate_pos_embedding(value, num_patches))
        elif key == "norm.weight":
            add("transformer.norm.weight", value)
        elif key == "norm.bias":
            add("transformer.norm.bias", value)
    return new


def _read_state_file(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_pretrain(
    backbone: str, num_patches: int, depth_dim: int, save_dir: str
) -> Dict[str, np.ndarray]:
    """Offline equivalent of load_pretrained.load_pretrain: reads the timm
    state dict from ``save_dir/<timm_name>{,.pt,.npz}`` (the same location the
    reference caches its download — load_pretrained.py:27-28) and converts.
    Raises FileNotFoundError with guidance when absent (no network here)."""
    name = TIMM_MODEL_NAMES.get(backbone.lower().replace("_", "-"))
    if name is None:
        raise ValueError(f"Unsupported backbone: {backbone}")
    for cand in (name, name + ".pt", name + ".npz"):
        path = os.path.join(save_dir, cand)
        if os.path.exists(path):
            return convert_timm_state(_read_state_file(path), num_patches, depth_dim)
    raise FileNotFoundError(
        f"No pretrained weights for {backbone} under {save_dir} (expected "
        f"{name}[.pt|.npz]). This environment has no network access; place a "
        f"timm-format state dict there, or run with backbone weights omitted."
    )


def main():
    """CLI: convert a timm-format state dict to this framework's names.

        python -m gaviko_tpu.weights.convert <timm_state.pt|.npz> \
            --backbone vit-b16 --out converted.npz \
            [--num-patches 1000] [--depth-dim 12]
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("timm_state")
    parser.add_argument("--backbone", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--num-patches", type=int, default=1000)
    parser.add_argument("--depth-dim", type=int, default=12,
                        help="frame_patch_size (depth of the inflated kernel)")
    args = parser.parse_args()
    state = _read_state_file(args.timm_state)
    conv = convert_timm_state(state, args.num_patches, args.depth_dim)
    if args.out.endswith(".npz"):
        np.savez(args.out, **conv)
    else:
        from gaviko_tpu.weights.torch_io import save_pt

        save_pt(args.out, conv)
    print(f"wrote {len(conv)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
