"""Portable counter-based dropout bits for fused Pallas kernels.

The reference applies dropout to attention probabilities and MLP hiddens
(ref: src/model/vision_transformer.py:50-70, 26-38). Keeping the fused
kernels on the training path therefore needs dropout INSIDE the kernel.
``pltpu.prng_*`` cannot run in interpret mode on CPU (where the parity tests
execute), so instead of the hardware PRNG we derive bits from a stateless
integer hash (murmur3 fmix32 finalizer) of the absolute element coordinates:

    keep(row, col) = fmix32(row * R + col * C + seed + salt * S) & 0x7FFFFF
                     >= floor(rate * 2^23)

Identical int32 ops run inside a Pallas kernel (compiled OR interpret) and in
plain-XLA reference paths, so a mask-replaying fused backward is exactly
testable on CPU, and fwd/bwd masks agree by construction without carrying an
N^2 residual. Cost on the VPU is ~8 integer ops/element — cheap next to the
f32 softmax exp it sits beside.

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
    # P(drop) = floor(rate * 2^23) / 2^23 — exact to 1.2e-7.
    return np.int32(int(rate * (1 << 23)))


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
    """
    nd = len(shape)
    rows = row_offset + jax.lax.broadcasted_iota(jnp.int32, shape, nd - 2)
    cols = col_offset + jax.lax.broadcasted_iota(jnp.int32, shape, nd - 1)
    h = rows * _ROW + cols * _COL + seed + jnp.asarray(salt, jnp.int32) * _SALT
    h = mix_lite(h)
    # High bits of the multiplicative mix (bits 8..30) — low bits of h*odd
    # are poorly mixed.
    return (
        jax.lax.shift_right_logical(h, 8) & np.int32(0x7FFFFF)
    ) >= _threshold(rate)


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
