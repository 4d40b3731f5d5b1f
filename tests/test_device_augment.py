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


def test_shear_warp_matches_gather_warp():
    """The banded-matmul shear path must reproduce the direct trilinear
    gather warp (same RNG, same transform) up to the extra smoothing of
    sequential 1D interpolation — a few percent on smooth volumes."""
    from scipy.ndimage import gaussian_filter, zoom

    from gaviko_tpu.ops.augment import _affine_one, _affine_shear_one

    rng = np.random.RandomState(0)
    vol = gaussian_filter(
        zoom(rng.rand(6, 8, 8), (4, 4, 4), order=1), 1.5
    ).astype(np.float32)[None]
    for seed in (42, 7):
        key = jax.random.PRNGKey(seed)
        a = np.asarray(_affine_one(jnp.asarray(vol), key, 15.0, 0.1, 1.0))
        b = np.asarray(_affine_shear_one(jnp.asarray(vol), key, 15.0, 0.1, 1.0))
        # interior (boundary zero-fill rims differ slightly)
        i = (0, slice(4, -4), slice(5, -5), slice(5, -5))
        span = float(a[i].max() - a[i].min())
        rel_mae = float(np.abs(a[i] - b[i]).mean()) / span
        assert rel_mae < 0.03, rel_mae


def test_shear_warp_identity_is_exact():
    from gaviko_tpu.ops.augment import _affine_shear_one

    rng = np.random.RandomState(1)
    vol = rng.rand(1, 10, 12, 12).astype(np.float32)
    out = np.asarray(_affine_shear_one(jnp.asarray(vol), jax.random.PRNGKey(0),
                                       0.0, 0.0, 1.0))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_train_augment_methods_agree_statistically():
    """shear and gather paths produce the same distribution family: equal
    shapes, [0,1] range, and close batch-level moments under the same key."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 1, 12, 16, 16).astype(np.float32))
    key = jax.random.PRNGKey(5)
    a = np.asarray(train_augment(x, key, method="gather"))
    b = np.asarray(train_augment(x, key, method="shear"))
    assert a.shape == b.shape
    assert abs(a.mean() - b.mean()) < 0.02
    assert abs(a.std() - b.std()) < 0.02
