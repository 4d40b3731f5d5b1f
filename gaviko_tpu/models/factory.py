"""Model factory + trainable-parameter masks for every method.

Replaces the reference's if/elif chain duplicated across train/eval/inference
(ref: src/train.py:111-153, src/eval.py:39-81, src/inference.py:38-80) with a
single registry. Each entry provides:

- ``init(rng, spec) -> params``  (flat dict, reference state_dict names)
- ``apply(params, img, spec, train=..., rng=...) -> logits``
- ``trainable(name) -> bool``  (exact reference requires_grad semantics)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax

from gaviko_tpu.config import ModelSpec, make_spec
from gaviko_tpu.core.layers import Params
from gaviko_tpu.core import vit as vit_core

_BACKBONE_NAMES = ("transformer", "cls_token", "conv_proj", "pos_embedding")


def _is_backbone(name: str) -> bool:
    return any(s in name for s in _BACKBONE_NAMES)


# --- trainable masks, each replicating the reference's requires_grad loops ---

def _trainable_linear(name: str, spec: ModelSpec) -> bool:
    # ref: train.py:114-121 — head-only.
    return "head" in name


def _trainable_fft(name: str, spec: ModelSpec) -> bool:
    return True


def _trainable_bitfit(name: str, spec: ModelSpec) -> bool:
    # ref: train.py:129-137 — any bias, plus the head.
    return "bias" in name or "head" in name


def _trainable_gaviko(name: str, spec: ModelSpec) -> bool:
    # ref: gaviko.py:429-434 (applies only when freeze_vit).
    # global_query/local_query are state_dict aliases of the fusion
    # query_proj modules; torch named_parameters() dedups shared tensors to
    # the first-registered name, so aliases never appear in tuning_params.
    if ".global_query." in name or ".local_query." in name:
        return False
    if not spec.freeze_vit:
        return True
    trainable = True
    if _is_backbone(name):
        trainable = False
    if "head" in name or "prompt" in name or "local_attn" in name:
        trainable = True
    return trainable


def _trainable_vpt(name: str, spec: ModelSpec) -> bool:
    # ref: vpt.py:91-94 — freezes backbone names *inside* the wrapped ViT.
    if not spec.freeze_vit:
        return True
    if name.startswith("vision_transformer."):
        inner = name[len("vision_transformer."):]
        return not _is_backbone(inner)
    return True


def _trainable_adaptformer(name: str, spec: ModelSpec) -> bool:
    # ref: adaptformer.py:164-169.
    if not spec.freeze_vit:
        return True
    trainable = True
    if _is_backbone(name):
        trainable = False
    if "adapter" in name or "head" in name:
        trainable = True
    return trainable


def _trainable_dvpt(name: str, spec: ModelSpec) -> bool:
    # ref: dvpt.py:156-161.
    if not spec.freeze_vit:
        return True
    trainable = True
    if _is_backbone(name):
        trainable = False
    if "prompt" in name or "head" in name:
        trainable = True
    return trainable


def _trainable_evp(name: str, spec: ModelSpec) -> bool:
    # ref: evp.py:322-327 — backbone names frozen, prompt_generator re-enabled;
    # mlp_head matches neither filter so it keeps its ctor default (trainable).
    if not spec.freeze_vit:
        return True
    trainable = True
    if _is_backbone(name):
        trainable = False
    if "prompt_generator" in name:
        trainable = True
    return trainable


def _trainable_ssf(name: str, spec: ModelSpec) -> bool:
    # ref: ssf.py:204-209 — scale/shift re-enabled; the head never matches
    # either filter so it keeps its ctor default (trainable).
    if not spec.freeze_vit:
        return True
    trainable = True
    if _is_backbone(name):
        trainable = False
    if "scale" in name or "shift" in name:
        trainable = True
    return trainable


def _trainable_melo(name: str, spec: ModelSpec) -> bool:
    # ref: melo.py:62-91 — everything frozen except the LoRA A/B factors and
    # the freshly replaced head.
    return "linear_a_" in name or "linear_b_" in name or "mlp_head" in name


@dataclasses.dataclass(frozen=True)
class Model:
    spec: ModelSpec
    init: Callable[..., Params]
    apply: Callable[..., jax.Array]
    _trainable: Callable[[str, ModelSpec], bool]

    def trainable(self, name: str) -> bool:
        return self._trainable(name, self.spec)

    def trainable_names(self, params: Params) -> list[str]:
        return [k for k in params if self.trainable(k)]

    def trainable_mask(self, params: Params) -> Dict[str, bool]:
        return {k: self.trainable(k) for k in params}


def build_model(model_cfg: dict) -> Model:
    """config['model'] -> Model with init/apply/trainable."""
    spec = make_spec(model_cfg)
    method = spec.method

    if method in ("linear", "fft", "bitfit"):
        mask = {
            "linear": _trainable_linear,
            "fft": _trainable_fft,
            "bitfit": _trainable_bitfit,
        }[method]
        return Model(spec, vit_core.vit_init, vit_core.vit_apply, mask)
    if method in ("deep_vpt", "shallow_vpt"):
        from gaviko_tpu.models import vpt

        return Model(spec, vpt.init, vpt.apply, _trainable_vpt)
    if method == "adaptformer":
        from gaviko_tpu.models import adaptformer

        return Model(spec, adaptformer.init, adaptformer.apply, _trainable_adaptformer)
    if method == "dvpt":
        from gaviko_tpu.models import dvpt

        return Model(spec, dvpt.init, dvpt.apply, _trainable_dvpt)
    if method == "ssf":
        from gaviko_tpu.models import ssf

        return Model(spec, ssf.init, ssf.apply, _trainable_ssf)
    if method == "evp":
        from gaviko_tpu.models import evp

        return Model(spec, evp.init, evp.apply, _trainable_evp)
    if method == "melo":
        from gaviko_tpu.models import melo

        return Model(spec, melo.init, melo.apply, _trainable_melo)
    if method == "gaviko":
        from gaviko_tpu.models import gaviko

        return Model(spec, gaviko.init, gaviko.apply, _trainable_gaviko)
    raise ValueError(f"Unknown method: {method}")
