"""Harness for loading the PyTorch reference models as parity oracles.

Imports /root/reference/src model code (read-only upstream reference), with
the timm download path stubbed out (no network in this environment): models
are built with their *actual* torch-default random init, their state_dict is
serialized to numpy, loaded into the JAX build, and logits are compared.
This sidesteps RNG-parity entirely (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np

REF_SRC = "/root/reference/src"

_initialized = False


def _ensure_ref_importable():
    global _initialized
    if _initialized:
        return
    if REF_SRC not in sys.path:
        # Append (not insert-at-0) so the reference's src/train.py etc. never
        # shadow this repo's root train.py/eval.py/inference.py modules.
        sys.path.append(REF_SRC)
    # utils.load_pretrained imports timm at module scope; stub it (it is only
    # used inside load_pretrain, which we neutralize below).
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    import utils.load_pretrained as lp  # noqa: E402

    # No network: backbone ctors would call timm; make the pretrained dict
    # empty so models keep torch-default init (strict=False load of {}).
    lp.load_pretrain = lambda *a, **k: {}
    _initialized = True


@contextlib.contextmanager
def _chdir_tmp(tmpdir):
    old = os.getcwd()
    os.chdir(tmpdir)
    try:
        yield
    finally:
        os.chdir(old)


def build_ref_model(method: str, model_cfg: dict, tmpdir: str, seed: int = 0):
    """Replicates the entry-point factory chain (ref: src/train.py:111-153)."""
    _ensure_ref_importable()
    import torch

    torch.manual_seed(seed)
    cfg = dict(model_cfg)
    cfg["method"] = method
    with _chdir_tmp(tmpdir):  # VPT writes deep_prompt.txt at ctor (vpt.py:54-55)
        if method == "gaviko":
            from model.gaviko import Gaviko

            model = Gaviko(**cfg)
        elif method in ("linear", "fft", "bitfit"):
            from model.vision_transformer import VisionTransformer

            model = VisionTransformer(**cfg)
        elif method == "adaptformer":
            from model.adaptformer import AdaptFormer

            model = AdaptFormer(**cfg)
        elif method == "dvpt":
            from model.dvpt import DynamicVisualPromptTuning

            model = DynamicVisualPromptTuning(**cfg)
        elif method == "evp":
            import model.evp as evp_mod

            evp_mod.device = torch.device("cpu")
            model = evp_mod.ExplicitVisualPrompting(**cfg)
        elif method == "ssf":
            from model.ssf import ScalingShiftingFeatures

            model = ScalingShiftingFeatures(**cfg)
        elif method == "melo":
            from model.melo import MeLO
            from model.vision_transformer import VisionTransformer

            vit = VisionTransformer(**cfg)
            model = MeLO(vit=vit, **cfg)
        elif method in ("deep_vpt", "shallow_vpt"):
            from model.vpt import PromptedVisionTransformer

            cfg["deep_prompt"] = method == "deep_vpt"
            model = PromptedVisionTransformer(**cfg)
        else:
            raise ValueError(method)
    model.eval()
    return model


def state_dict_numpy(model) -> dict[str, np.ndarray]:
    # .numpy() ALIASES torch tensor memory, and jax-on-CPU device_put can be
    # zero-copy — without .copy(), a later in-place torch optimizer step
    # would silently mutate the "loaded" jax params.
    return {
        k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()
    }


def ref_logits(model, x_np: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(x_np)).numpy()


def ref_trainable_names(model) -> set[str]:
    return {k for k, p in model.named_parameters() if p.requires_grad}


# Tiny geometry shared by parity tests: grid (2,2,2) -> 8 patches, vit-t16 dims.
TINY_MODEL_CFG = dict(
    image_size=32,
    image_patch_size=16,
    frames=24,
    frame_patch_size=12,
    num_classes=5,
    channels=1,
    pool="cls",
    backbone="vit-t16",
    dropout=0.1,
    emb_dropout=0.1,
)
