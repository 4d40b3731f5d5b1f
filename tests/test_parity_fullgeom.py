"""Full-geometry parity: the torch oracle at the REAL volume/grid shapes.

The per-method parity tests run at a (2,2,2) patch grid; this file locks the
real (10,10,10) grid — 1000 image tokens, the 1033-token GAViKO global
stream, the 1000x1000 local-window mask, and the tile-padding paths — against
the torch reference. Depth is cut to 2 on BOTH sides (the reference derives
depth from the backbone name, so its mapping_vit is monkeypatched; ref:
src/utils/load_pretrained.py:103-120) to keep the CPU oracle tractable; all
indexing/masking logic is depth-independent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu import config as config_mod
from gaviko_tpu.models.factory import build_model
from gaviko_tpu.weights.state_dict import load_state_dict

from tests.torch_ref import (
    _ensure_ref_importable,
    build_ref_model,
    ref_logits,
    state_dict_numpy,
)

DEPTH2 = {"depth": 2, "heads": 3, "dim": 192, "mlp_dim": 768}

FULL_GEOM = dict(
    image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
    num_classes=5, channels=1, pool="cls", backbone="vit-t16",
    dropout=0.1, emb_dropout=0.1,
)

CFGS = {
    "fft": {},
    "gaviko": dict(
        freeze_vit=True, num_prompts=32, prompt_latent_dim=20, local_dim=20,
        local_k=[6, 6, 6], DHW=[10, 10, 10], attn_drop=0.2, proj_drop=0.2,
        share_factor=1,
    ),
}


@pytest.fixture()
def depth2_backbone(monkeypatch):
    """Force vit-t16 -> depth 2 on both frameworks."""
    _ensure_ref_importable()
    import model.gaviko as ref_gaviko
    import model.vision_transformer as ref_vit

    mapping = lambda backbone: (2, 3, 192, 768)  # noqa: E731
    monkeypatch.setattr(ref_gaviko, "mapping_vit", mapping)
    monkeypatch.setattr(ref_vit, "mapping_vit", mapping)
    monkeypatch.setitem(config_mod.VIT_CONFIG_MAP, "vit-t16", DEPTH2)


@pytest.mark.parametrize("name", sorted(CFGS))
def test_full_geometry_parity(name, depth2_backbone, tmp_path):
    cfg = {**FULL_GEOM, **CFGS[name]}
    ref = build_ref_model(name, cfg, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**cfg, "method": name})
    assert model.spec.depth == 2 and model.spec.num_patches == 1000
    params = model.init(jax.random.PRNGKey(0), model.spec)
    assert set(params) == set(state)
    params, _, _ = load_state_dict(params, state)

    vol = np.random.RandomState(11).rand(1, 1, 120, 160, 160).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda p, x: model.apply(p, x, model.spec)
    )(params, jnp.asarray(vol)))
    want = ref_logits(ref, vol)
    mae = np.abs(got - want).mean()
    assert mae < 1e-4, f"{name} full-geometry logit MAE {mae}"


@pytest.mark.parametrize("name", sorted(CFGS))
def test_full_depth_full_geometry_parity(name, tmp_path):
    """The real 12-layer vit-b16 at the real (10,10,10) grid vs torch —
    no depth cut, no geometry cut (round-3 verdict #6: previously no single
    test ran the production layer count against the oracle). fp32 on CPU,
    MAE < 1e-4 (the BASELINE.json correctness north star). Ref:
    src/model/gaviko.py:531-551 (forward), src/model/vision_transformer.py
    (backbone blocks)."""
    cfg = {**FULL_GEOM, **CFGS[name], "backbone": "vit-b16"}
    ref = build_ref_model(name, cfg, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**cfg, "method": name})
    assert model.spec.depth == 12 and model.spec.num_patches == 1000
    params = model.init(jax.random.PRNGKey(0), model.spec)
    assert set(params) == set(state)
    params, _, _ = load_state_dict(params, state)

    vol = np.random.RandomState(13).rand(1, 1, 120, 160, 160).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda p, x: model.apply(p, x, model.spec)
    )(params, jnp.asarray(vol)))
    want = ref_logits(ref, vol)
    mae = np.abs(got - want).mean()
    assert mae < 1e-4, f"{name} full-depth full-geometry logit MAE {mae}"
