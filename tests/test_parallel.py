"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gaviko_tpu.models.factory import build_model
from gaviko_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    shardings_for_params,
)
from gaviko_tpu.train.loop import make_optimizer, make_steps, split_params
from gaviko_tpu.train.losses import cross_entropy_loss

from tests.torch_ref import TINY_MODEL_CFG

TINY = {**TINY_MODEL_CFG, "backbone": "vit-s16"}  # dim 384 divides model=2/4


def _setup(method="gaviko", **extra):
    cfg = {**TINY, "method": method, **extra}
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    return model, params


def test_dp_tp_train_step_runs_and_matches_single_device():
    model, params = _setup(
        method="gaviko", freeze_vit=True, num_prompts=4, prompt_latent_dim=8,
        local_dim=8, local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.0,
        proj_drop=0.0, dropout=0.0, emb_dropout=0.0,
    )
    trainable, frozen = split_params(model, params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(trainable)

    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.rand(8, 1, 24, 32, 32).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, size=8).astype(np.int32))
    key = jax.random.PRNGKey(1)

    # Single-device reference step (donates its inputs -> feed it copies).
    t_copy = {k: jnp.array(v) for k, v in trainable.items()}
    train_step, _, _ = make_steps(model, cross_entropy_loss, tx)
    t1, _, loss1, correct1 = train_step(
        t_copy, tx.init(t_copy), frozen, inputs, labels, key
    )

    # 4-way data x 2-way tensor parallel step.
    mesh = make_mesh(data=4, model=2)
    step, eval_step, (t_p, f_p, o_p) = make_parallel_train_step(
        model, cross_entropy_loss, tx, mesh, trainable, frozen, opt_state
    )
    t2, o2, loss2, correct2 = step(t_p, o_p, f_p, inputs, labels, key)
    # Sharded eval step executes on the same mesh placements (t_p was
    # donated into the train step, so eval uses the updated t2).
    eloss, ecorrect, _ = eval_step(t2, f_p, inputs, labels)
    assert np.isfinite(float(eloss)) and 0 <= int(ecorrect) <= inputs.shape[0]

    assert abs(float(loss1) - float(loss2)) < 1e-5
    assert int(correct1) == int(correct2)
    for k in t1:
        np.testing.assert_allclose(
            np.asarray(t1[k]), np.asarray(t2[k]), atol=1e-5, err_msg=k
        )


def test_tp_rules_shard_attention_and_mlp():
    model, params = _setup(method="fft")
    mesh = make_mesh(data=2, model=4)
    sh = shardings_for_params(params, mesh, tp=True)
    qkv = sh["transformer.layers.0.0.to_qkv.weight"]
    assert qkv.spec == jax.sharding.PartitionSpec("model", None)
    fc2 = sh["transformer.layers.0.1.net.4.weight"]
    assert fc2.spec == jax.sharding.PartitionSpec(None, "model")
    # LayerNorms replicated.
    assert sh["transformer.norm.weight"].spec == jax.sharding.PartitionSpec()


def test_zero_opt_state_sharded_over_data():
    model, params = _setup(method="fft")
    trainable, frozen = split_params(model, params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(trainable)
    mesh = make_mesh(data=8, model=1)
    from gaviko_tpu.parallel.mesh import opt_state_shardings

    o_sh = opt_state_shardings(opt_state, {}, mesh, zero=True)
    # Adam mu for a big weight should be sharded over data.
    mu = o_sh[0].mu["transformer.layers.0.0.to_qkv.weight"]
    assert "data" in str(mu.spec)


def test_parallel_eval_step_applies_eval_rescale_under_device_augment():
    """With device_augment the loaders feed RAW volumes; the sharded eval
    step must apply the deterministic intensity rescale exactly like the
    single-device make_steps path (regression: it used to evaluate on
    unrescaled inputs, corrupting best-checkpoint / early-stop decisions)."""
    model, params = _setup(
        method="fft", dropout=0.0, emb_dropout=0.0,
    )
    trainable, frozen = split_params(model, params)
    tx = optax.adam(1e-3)
    opt_state = tx.init(trainable)
    mesh = make_mesh(data=2, model=2)
    _, eval_step, (t_p, f_p, _) = make_parallel_train_step(
        model, cross_entropy_loss, tx, mesh, trainable, frozen, opt_state,
        device_augment=True,
    )

    rng = np.random.RandomState(0)
    # Raw (unrescaled) volumes in an arbitrary intensity range.
    raw = jnp.asarray((rng.rand(4, 1, 24, 32, 32) * 900 - 100).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, size=4).astype(np.int32))
    loss_p, correct_p, logits_p = eval_step(t_p, f_p, raw, labels)

    from gaviko_tpu.ops.augment import eval_rescale

    want = np.asarray(model.apply(params, eval_rescale(raw), model.spec))
    np.testing.assert_allclose(np.asarray(logits_p), want, atol=1e-4)
