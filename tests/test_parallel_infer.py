"""Mesh-parallel inference (parallel/infer.py): DP2xTP4 on the virtual
8-device CPU mesh reproduces the single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaviko_tpu.models.factory import build_model
from gaviko_tpu.parallel.infer import parallel_predictor_fn


@pytest.fixture(scope="module")
def model_and_params():
    cfg = dict(image_size=32, image_patch_size=16, frames=24,
               frame_patch_size=12, num_classes=5, channels=1, pool="cls",
               backbone="vit-s16", method="fft", dropout=0.1,
               emb_dropout=0.1)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    return model, params


def test_dp2_tp4_matches_single_device(model_and_params):
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, params = model_and_params
    vol = jnp.asarray(
        np.random.RandomState(0).rand(4, 1, 24, 32, 32).astype(np.float32))
    base = np.asarray(model.apply(params, vol, model.spec))
    fwd, sharded, mesh = parallel_predictor_fn(model, params, data=2, tp=4)
    assert mesh.shape == {"data": 2, "model": 4}
    got = np.asarray(fwd(sharded, vol))
    np.testing.assert_allclose(got, base, rtol=0, atol=2e-5)
    # TP actually sharded something (vit-s16 heads=6 won't divide by 4 on
    # the qkv rows? inner*3 = 1152 rows / 4 = 288 — divisible).
    from gaviko_tpu.parallel.mesh import shardings_for_params
    shs = shardings_for_params(params, mesh, tp=True)
    assert any(s.spec != jax.sharding.PartitionSpec()
               for s in shs.values())


def test_dp_only_mesh(model_and_params):
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, params = model_and_params
    vol = jnp.asarray(
        np.random.RandomState(1).rand(8, 1, 24, 32, 32).astype(np.float32))
    base = np.asarray(model.apply(params, vol, model.spec))
    fwd, sharded, _ = parallel_predictor_fn(model, params, data=8, tp=1)
    got = np.asarray(fwd(sharded, vol))
    np.testing.assert_allclose(got, base, rtol=0, atol=2e-5)
