"""Logit parity of the plain 3D ViT (methods linear/fft/bitfit) vs the torch reference."""

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


@pytest.fixture(scope="module")
def tiny_input():
    rng = np.random.RandomState(42)
    return rng.rand(2, 1, 24, 32, 32).astype(np.float32)


@pytest.mark.parametrize("method", ["fft", "linear", "bitfit"])
def test_vit_logit_parity(method, tiny_input, tmp_path):
    ref = build_ref_model(method, TINY_MODEL_CFG, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**TINY_MODEL_CFG, "method": method})
    params = model.init(jax.random.PRNGKey(0), model.spec)
    assert set(params) == set(state), (
        f"param-name mismatch:\nours-only={sorted(set(params) - set(state))}\n"
        f"ref-only={sorted(set(state) - set(params))}"
    )
    params, missing, unexpected = load_state_dict(params, state)
    assert not missing and not unexpected

    got = np.asarray(jax.jit(
        lambda p, x: model.apply(p, x, model.spec)
    )(params, jnp.asarray(tiny_input)))
    want = ref_logits(ref, tiny_input)
    mae = np.abs(got - want).mean()
    assert mae < 1e-4, f"logit MAE {mae}"


@pytest.mark.parametrize("method", ["linear", "bitfit"])
def test_vit_trainable_mask_parity(method, tiny_input, tmp_path):
    import torch

    ref = build_ref_model(method, TINY_MODEL_CFG, str(tmp_path))
    # Entry points apply the requires_grad filter outside the ctor
    # (ref: train.py:114-137).
    for key, value in ref.named_parameters():
        if method == "linear":
            value.requires_grad = "head" in key
        else:  # bitfit
            value.requires_grad = "bias" in key or "head" in key

    model = build_model({**TINY_MODEL_CFG, "method": method})
    params = model.init(jax.random.PRNGKey(0), model.spec)
    assert set(model.trainable_names(params)) == ref_trainable_names(ref)
