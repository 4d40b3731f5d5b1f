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


# ---------------------------------------------------------------------------
# Shear-factored affine warp (the fast path)
# ---------------------------------------------------------------------------
#
# map_coordinates with traced coordinates lowers to dynamic gathers that run
# ~15x slower than static ones on TPU (~3.4 s/batch-8, ARCHITECTURE.md). The
# same affine warp factors into AXIS-ALIGNED resampling passes, each of which
# is a banded matrix contraction the MXU handles natively:
#
#   pull-back map  M = diag(1/s) . Rz(-g) . Ry(-b) . Rx(-a)
#   each axis rotation R(theta) = Shear1(-tan(theta/2)) . Shear2(sin theta)
#                                 . Shear1(-tan(theta/2))     (Paeth)
#   each shear/scale = 1D linear-interp resample along ONE axis whose source
#   coordinate is affine in the output coordinate (+ one orthogonal coord)
#
# 12 passes total (3 scale + 9 shear), each an einsum of the volume against
# a 2-banded (U, N_out, N_in) tent-weight tensor built from iotas — no
# gathers anywhere. Boundary handling matches mode="constant" (tent rows
# vanish outside [0, N-1]). Sequential 1D interpolation is slightly more
# smoothing than one trilinear gather; augmentation parity with torchio is
# distributional (PARITY.md), and equivalence to the gather path is
# regression-tested on smooth volumes (tests/test_device_augment.py).


def _tent_weights(n: int, a, b_per_u) -> jax.Array:
    """(U, N_out, N_in) linear-interp weights for src = a*w_out + b[u]."""
    w = jnp.arange(n, dtype=jnp.float32)
    src = a * w[None, :] + b_per_u[:, None]              # (U, N_out)
    t = 1.0 - jnp.abs(src[:, :, None] - w[None, None, :])
    return jnp.clip(t, 0.0, 1.0)                          # zero-fill outside


def _resample_axis(vol: jax.Array, axis: int, u_axis: int, a, b_per_u):
    """Resample ``axis`` of (D, H, W) vol: src = a*x_axis + b(x_{u_axis})."""
    T = _tent_weights(vol.shape[axis], a, b_per_u)        # (U, No, Ni)
    letters = "dhw"
    x, o = letters[axis], letters[axis].upper()
    u = letters[u_axis]
    spec = f"{letters.replace(x, x)},{u}{o}{x}->{letters.replace(x, o)}"
    out = jnp.einsum(spec, vol, T)
    # einsum emits the output with the renamed axis in place (same order).
    return out


def _shear_pass(vol, axis: int, u_axis: int, alpha, centers):
    b = alpha * (jnp.arange(vol.shape[u_axis], dtype=jnp.float32)
                 - centers[u_axis])
    # src_axis = x_axis + alpha*(x_u - c_u); keep the axis center fixed.
    return _resample_axis(vol, axis, u_axis, 1.0, b)


def _rot_passes(vol, plane, theta, centers):
    """Rotation by theta in the (i, j) ``plane`` as three shears.

    2D Paeth: R(t) = Sx(-tan(t/2)) Sy(sin t) Sx(-tan(t/2)) with
    Sx: x_src = x + a*(y - c_y). Passes compose left-factor-first (the
    first-applied pass is the leftmost factor of the source map).
    """
    i, j = plane
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    vol = _shear_pass(vol, i, j, a, centers)
    vol = _shear_pass(vol, j, i, b, centers)
    vol = _shear_pass(vol, i, j, a, centers)
    return vol


def _affine_shear_one(vol: jax.Array, key: jax.Array, degrees: float,
                      scales: float, p: float) -> jax.Array:
    """Shear-factored equivalent of _affine_one (same RNG contract)."""
    k_apply, k_rot, k_scale = jax.random.split(key, 3)
    C, D, H, W = vol.shape
    angles = jnp.deg2rad(
        jax.random.uniform(k_rot, (3,), minval=-degrees, maxval=degrees)
    )
    scale = jax.random.uniform(k_scale, (3,), minval=1.0 - scales,
                               maxval=1.0 + scales)
    centers = (jnp.array([D, H, W], jnp.float32) - 1.0) / 2.0

    def warp(ch):
        v = ch
        # Scale passes first (leftmost factor diag(1/s)); src = c + (x-c)/s.
        for ax in range(3):
            a = 1.0 / scale[ax]
            b0 = centers[ax] * (1.0 - a)
            v = _resample_axis(v, ax, (ax + 1) % 3,
                               a, jnp.full((v.shape[(ax + 1) % 3],), b0))
        # Then the transposed-rotation factors of inv(R) in composition
        # order: Rz^T [(d,h) plane], Ry^T [(d,w)], Rx^T [(h,w)]. NOTE
        # _rotation_matrix's ry carries +sin at [0,2] (the opposite
        # handedness of rx/rz), so its inverse is +angle in our
        # rotmat-(i,j) convention while rz/rx invert with -angle.
        v = _rot_passes(v, (0, 1), -angles[2], centers)
        v = _rot_passes(v, (0, 2), angles[1], centers)
        v = _rot_passes(v, (1, 2), -angles[0], centers)
        return v

    warped = jax.vmap(warp)(vol)
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
                  p_flip: float = 0.5, method: str = "shear") -> jax.Array:
    """batch: (B, C, D, H, W) raw volumes -> augmented + [0,1]-rescaled.

    ``method``: "shear" (banded-matmul passes, the fast TPU path) or
    "gather" (direct trilinear map_coordinates — the reference semantics,
    ~15x slower on TPU with traced indices; kept as the parity oracle)."""
    B = batch.shape[0]
    keys = jax.random.split(rng, 2 * B)
    affine = _affine_shear_one if method == "shear" else _affine_one

    def one(vol, ka, kf):
        v = affine(vol.astype(jnp.float32), ka, degrees, scales, p_affine)
        v = _flip_one(v, kf, p_flip)
        return rescale_minmax(v).astype(batch.dtype)

    return jax.vmap(one)(batch, keys[:B], keys[B:])


def eval_rescale(batch: jax.Array) -> jax.Array:
    """Deterministic eval path: per-volume min-max rescale on device."""
    return jax.vmap(lambda v: rescale_minmax(v.astype(jnp.float32)).astype(batch.dtype))(batch)
