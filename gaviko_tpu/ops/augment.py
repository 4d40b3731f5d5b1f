"""Device-side training augmentation: affine + flip + rescale on TPU.

The reference runs torchio augmentations in DataLoader worker processes
(src/train.py:38-54). On this class of host (the bench machine has ONE CPU
core) a scipy affine costs ~215 ms/volume and caps training at ~1 volume/s
while the chip idles. The TPU-native answer is to stream RAW volumes to the
device and apply the augmentation inside the jitted train step:

- per-sample rotation (+-15 deg per axis) and scale ([0.9, 1.1]) about the
  volume center, trilinear resampling via jax map_coordinates (gathers on
  TPU, a few ms per batch);
- D-axis flip with p=0.5 (tio.RandomFlip(axes=0));
- per-volume min-max rescale to [0, 1].

Distributionally equivalent to the host pipeline (augmentation parity with
torchio is distributional by nature — PARITY.md); enabled with
``train.device_augment: true``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rotation_matrix(key: jax.Array, degrees: float) -> jax.Array:
    angles = jnp.deg2rad(
        jax.random.uniform(key, (3,), minval=-degrees, maxval=degrees)
    )
    cd, ch, cw = jnp.cos(angles)
    sd, sh, sw = jnp.sin(angles)
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cd, -sd], [0.0, sd, cd]])
    ry = jnp.array([[ch, 0.0, sh], [0.0, 1.0, 0.0], [-sh, 0.0, ch]])
    rz = jnp.array([[cw, -sw, 0.0], [sw, cw, 0.0], [0.0, 0.0, 1.0]])
    return rx @ ry @ rz


def _affine_one(vol: jax.Array, key: jax.Array, degrees: float, scales: float,
                p: float) -> jax.Array:
    """vol: (C, D, H, W). Pull-back trilinear resample about the center."""
    k_apply, k_rot, k_scale = jax.random.split(key, 3)
    C, D, H, W = vol.shape
    rot = _rotation_matrix(k_rot, degrees)
    scale = jax.random.uniform(k_scale, (3,), minval=1.0 - scales,
                               maxval=1.0 + scales)
    inv = jnp.linalg.inv(rot * scale[None, :])
    center = (jnp.array([D, H, W], jnp.float32) - 1.0) / 2.0
    grid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(D, dtype=jnp.float32),
            jnp.arange(H, dtype=jnp.float32),
            jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=0,
    ).reshape(3, -1)  # [3, DHW] output coordinates
    src = inv @ (grid - center[:, None]) + center[:, None]

    def sample(ch):
        out = jax.scipy.ndimage.map_coordinates(ch, list(src), order=1,
                                                mode="constant", cval=0.0)
        return out.reshape(D, H, W)

    warped = jax.vmap(sample)(vol)
    return jnp.where(jax.random.uniform(k_apply) < p, warped, vol)


def _flip_one(vol: jax.Array, key: jax.Array, p: float) -> jax.Array:
    return jnp.where(jax.random.uniform(key) < p, vol[:, ::-1], vol)


def rescale_minmax(vol: jax.Array) -> jax.Array:
    lo = jnp.min(vol)
    hi = jnp.max(vol)
    return jnp.where(hi > lo, (vol - lo) / jnp.maximum(hi - lo, 1e-30),
                     jnp.zeros_like(vol))


def train_augment(batch: jax.Array, rng: jax.Array, *, degrees: float = 15.0,
                  scales: float = 0.1, p_affine: float = 0.5,
                  p_flip: float = 0.5) -> jax.Array:
    """batch: (B, C, D, H, W) raw volumes -> augmented + [0,1]-rescaled."""
    B = batch.shape[0]
    keys = jax.random.split(rng, 2 * B)

    def one(vol, ka, kf):
        v = _affine_one(vol.astype(jnp.float32), ka, degrees, scales, p_affine)
        v = _flip_one(v, kf, p_flip)
        return rescale_minmax(v).astype(batch.dtype)

    return jax.vmap(one)(batch, keys[:B], keys[B:])


def eval_rescale(batch: jax.Array) -> jax.Array:
    """Deterministic eval path: per-volume min-max rescale on device."""
    return jax.vmap(lambda v: rescale_minmax(v.astype(jnp.float32)).astype(batch.dtype))(batch)
