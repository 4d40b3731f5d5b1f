"""Assemble model params with timm-converted backbone weights + checkpoints.

Replicates the reference's loading topology:
- at build time each model loads the converted timm dict with strict=False
  name-intersection (so only the keys that actually match land — SURVEY §3.5);
- for wrapped models the converted keys must be prefixed with the wrapper's
  module name (``vision_transformer.`` for VPT, ``lora_vit.`` for MeLO) to
  reach the inner ViT, because the reference loads the inner ViT *inside its
  own ctor* before wrapping;
- eval/inference overlays the trainable-only checkpoint on top
  ({**vanilla, **ckpt} — load_pretrained.py:150-156).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax

from gaviko_tpu.models.factory import Model
from gaviko_tpu.weights import convert
from gaviko_tpu.weights.state_dict import load_state_dict, merge_states


def pretrained_key_prefix(method: str) -> str:
    if method in ("deep_vpt", "shallow_vpt"):
        return "vision_transformer."
    if method == "melo":
        return "lora_vit."
    return ""


def build_params(
    model: Model,
    rng: jax.Array,
    pretrained_dir: Optional[str] = "./pretrained",
    checkpoint_path: Optional[str] = None,
    require_pretrained: bool = False,
) -> Dict:
    """init -> optional timm-converted load -> optional checkpoint overlay."""
    params = model.init(rng, model.spec)
    spec = model.spec
    state = {}
    if spec.backbone is not None and pretrained_dir is not None:
        try:
            conv = convert.load_pretrain(
                spec.backbone, spec.num_patches, spec.frame_patch_size, pretrained_dir
            )
            prefix = pretrained_key_prefix(spec.method)
            state = {prefix + k: v for k, v in conv.items()}
            logging.info(f"Loaded pretrained {spec.backbone} from {pretrained_dir}")
        except FileNotFoundError as e:
            if require_pretrained:
                raise
            logging.warning(f"{e} — continuing with random init.")
    if checkpoint_path:
        from gaviko_tpu.weights.torch_io import load_checkpoint

        ckpt = load_checkpoint(checkpoint_path)
        state = merge_states(state, ckpt)
        logging.info(f"Loaded checkpoint overlay from {checkpoint_path}")
    if state:
        params, _, unexpected = load_state_dict(params, state)
        if unexpected:
            logging.info(f"Ignored {len(unexpected)} unmatched checkpoint keys")
    return params
