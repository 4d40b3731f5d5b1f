"""Logit + trainable-mask parity for GAViKO and EVP vs the torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.models.factory import build_model
from gaviko_tpu.weights.state_dict import load_state_dict

from tests.torch_ref import (
    TINY_MODEL_CFG,
    build_ref_model,
    ref_logits,
    ref_trainable_names,
    state_dict_numpy,
)

CFGS = {
    "gaviko": dict(
        freeze_vit=True, num_prompts=5, prompt_latent_dim=12, local_dim=12,
        local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.2, proj_drop=0.2,
        share_factor=1,
    ),
    "gaviko_shared": dict(
        freeze_vit=True, num_prompts=5, prompt_latent_dim=12, local_dim=12,
        local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.2, proj_drop=0.2,
        share_factor=5,
    ),
    "evp": dict(
        freeze_vit=True, scale_factor=4, input_type="fft", freq_nums=0.25,
        handcrafted_tune=True, embedding_tune=True,
    ),
}


@pytest.fixture(scope="module")
def tiny_input():
    rng = np.random.RandomState(3)
    return rng.rand(2, 1, 24, 32, 32).astype(np.float32)


@pytest.mark.parametrize("name", sorted(CFGS))
def test_parity(name, tiny_input, tmp_path):
    method = "gaviko" if name.startswith("gaviko") else name
    cfg = {**TINY_MODEL_CFG, **CFGS[name]}
    ref = build_ref_model(method, cfg, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**cfg, "method": method})
    params = model.init(jax.random.PRNGKey(0), model.spec)
    assert set(params) == set(state), (
        f"param-name mismatch for {name}:\n"
        f"ours-only={sorted(set(params) - set(state))}\n"
        f"ref-only={sorted(set(state) - set(params))}"
    )
    for k in params:
        assert tuple(params[k].shape) == tuple(state[k].shape), (
            f"{k}: ours {params[k].shape} vs ref {state[k].shape}"
        )
    params, _, _ = load_state_dict(params, state)

    got = np.asarray(jax.jit(
        lambda p, x: model.apply(p, x, model.spec)
    )(params, jnp.asarray(tiny_input)))
    want = ref_logits(ref, tiny_input)
    mae = np.abs(got - want).mean()
    assert mae < 1e-4, f"{name} logit MAE {mae}"

    assert set(model.trainable_names(params)) == ref_trainable_names(ref), name


def test_local_mask_matches_reference_loop(tmp_path):
    """The closed-form mask predicate equals the reference's padded-loop mask."""
    import torch

    from gaviko_tpu.ops.local_attention import local_mask_additive_np

    from model.gaviko import LocalSelfAttention  # via torch_ref sys.path

    for DHW, local_k in [((2, 2, 2), (2, 2, 2)), ((3, 4, 2), (3, 2, 2)),
                         ((4, 4, 4), (2, 3, 4))]:
        ref = LocalSelfAttention(dim=16, local_k=local_k, DHW=DHW)
        ref_mask = ref.mask[0].numpy()
        ours = local_mask_additive_np(DHW, local_k)
        assert ours.shape == ref_mask.shape
        assert np.array_equal(np.isneginf(ours), np.isneginf(ref_mask))
        assert np.array_equal(ours == 0, ref_mask == 0)
