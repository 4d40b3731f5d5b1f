"""Logit + trainable-mask parity for the PEFT method family vs the torch reference."""

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

METHOD_CFGS = {
    "shallow_vpt": dict(
        freeze_vit=True, num_prompts=4, prompt_dim=16, prompt_dropout=0.1,
        deep_prompt=False,
    ),
    "deep_vpt": dict(
        freeze_vit=True, num_prompts=4, prompt_dim=16, prompt_dropout=0.1,
        deep_prompt=True,
    ),
    "adaptformer": dict(freeze_vit=True),
    "ssf": dict(freeze_vit=True),
    "dvpt": dict(freeze_vit=True, num_prompts=6, pool="mean"),
    "melo": dict(freeze_vit=True, r=4, alpha=4),
}


@pytest.fixture(scope="module")
def tiny_input():
    rng = np.random.RandomState(7)
    return rng.rand(2, 1, 24, 32, 32).astype(np.float32)


@pytest.mark.parametrize("method", sorted(METHOD_CFGS))
def test_method_parity(method, tiny_input, tmp_path):
    cfg = {**TINY_MODEL_CFG, **METHOD_CFGS[method]}
    ref = build_ref_model(method, cfg, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**cfg, "method": method})
    params = model.init(jax.random.PRNGKey(0), model.spec)
    assert set(params) == set(state), (
        f"param-name mismatch for {method}:\n"
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
    assert mae < 1e-4, f"{method} logit MAE {mae}"

    assert set(model.trainable_names(params)) == ref_trainable_names(ref), method
