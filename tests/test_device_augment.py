"""Device-side augmentation: semantics + end-to-end training path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.ops.augment import eval_rescale, rescale_minmax, train_augment


def test_eval_rescale_matches_host():
    from gaviko_tpu.data.transforms import rescale_intensity

    rng = np.random.RandomState(0)
    x = rng.rand(3, 1, 8, 8, 8).astype(np.float32) * 50 - 10
    got = np.asarray(eval_rescale(jnp.asarray(x)))
    want = np.stack([rescale_intensity(v) for v in x])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_train_augment_shapes_and_range():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 1, 12, 16, 16).astype(np.float32) * 9)
    out = np.asarray(train_augment(x, jax.random.PRNGKey(0)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


def test_train_augment_identity_when_probs_zero():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 1, 8, 8, 8).astype(np.float32))
    out = np.asarray(train_augment(x, jax.random.PRNGKey(0), p_affine=0.0,
                                   p_flip=0.0))
    want = np.asarray(eval_rescale(x))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_train_augment_flip_only_matches_host_flip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 1, 6, 8, 8).astype(np.float32))
    out = np.asarray(train_augment(x, jax.random.PRNGKey(0), p_affine=0.0,
                                   p_flip=1.0))
    want = np.asarray(eval_rescale(jnp.asarray(np.asarray(x)[:, :, ::-1].copy())))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_training_with_device_augment(tmp_path):
    import train as train_mod
    from tests.test_end_to_end import make_synth_dataset, tiny_config

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, method="bitfit", epochs=2)
    config["train"]["device_augment"] = True
    result = train_mod.train(config)
    import pandas as pd

    log = pd.read_csv(result["csv_log"])
    assert np.isfinite(log["train_step_loss"]).all()
    assert result["best_ckpt_path"]
