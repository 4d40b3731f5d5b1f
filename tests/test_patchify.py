"""Pallas patchify kernel: correctness + gradients vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.config import make_spec
from gaviko_tpu.ops.patchify import (
    _patchify_reference,
    patchify_fused,
    patchify_pallas,
)

SPEC = make_spec(dict(
    image_size=32, image_patch_size=16, frames=24, frame_patch_size=12,
    num_classes=5, channels=1, pool="cls", backbone="vit-t16", method="fft",
))


def _inputs(dim=192, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(2, 1, 24, 32, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(dim, 1, 12, 16, 16) * 0.02).astype(np.float32))
    b = jnp.asarray(rng.randn(dim).astype(np.float32))
    return img, w, b


def _zeros_pos(w, img):
    return jnp.zeros((SPEC.num_patches, w.shape[0]), img.dtype)


def test_patchify_matches_reference():
    img, w, b = _inputs()
    want = _patchify_reference(img, w, b, _zeros_pos(w, img), SPEC)
    got = patchify_pallas(img, w, b, _zeros_pos(w, img), SPEC)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_patchify_small_outdim():
    img, w, b = _inputs(dim=48, seed=1)  # EVP prompt generator path
    want = _patchify_reference(img, w, b, _zeros_pos(w, img), SPEC)
    got = patchify_pallas(img, w, b, _zeros_pos(w, img), SPEC)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_patchify_pos_fused():
    img, w, b = _inputs(seed=2)
    rng = np.random.RandomState(9)
    pos = jnp.asarray(rng.randn(SPEC.num_patches, w.shape[0]).astype(np.float32))
    want = _patchify_reference(img, w, b, pos, SPEC)
    got = patchify_pallas(img, w, b, pos, SPEC)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_patchify_pos_gradients():
    img, w, b = _inputs(seed=3)
    rng = np.random.RandomState(11)
    pos = jnp.asarray(rng.randn(SPEC.num_patches, w.shape[0]).astype(np.float32))

    def loss_fused(pos):
        return jnp.sum(patchify_fused(img, w, b, pos, SPEC) ** 2)

    def loss_ref(pos):
        return jnp.sum(_patchify_reference(img, w, b, pos, SPEC) ** 2)

    g1 = jax.grad(loss_fused)(pos)
    g2 = jax.grad(loss_ref)(pos)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_patchify_gradients():
    img, w, b = _inputs()

    def loss_fused(img, w, b):
        return jnp.sum(patchify_fused(img, w, b, _zeros_pos(w, img),
                                      SPEC) ** 2)

    def loss_ref(img, w, b):
        return jnp.sum(_patchify_reference(img, w, b, _zeros_pos(w, img),
                                           SPEC) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(img, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(img, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)
