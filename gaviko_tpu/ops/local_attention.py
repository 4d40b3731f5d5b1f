"""3D-neighborhood local attention mask for GAViKO's local stream.

The reference builds a (N, N) additive mask with a Python triple loop over a
padded ones-tensor (ref: src/model/gaviko.py:212-227). The semantics reduce to
a closed-form predicate on patch-grid coordinates: query token p at (d,h,w)
may attend key token q at (d2,h2,w2) iff, per axis with window k:

    (q_coord - p_coord) in [-(k // 2), k - 1 - k // 2]

(for even k the window is asymmetric — e.g. k=6 gives [-3, +2] — exactly the
reference's ``dk//2`` crop arithmetic). Allowed pairs get additive 0, the rest
-inf. We build it vectorized with broadcasted iota; the Pallas local-attention
kernel evaluates the same predicate per block instead of materializing N^2.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def local_mask_additive_np(
    DHW: Tuple[int, int, int], local_k: Tuple[int, int, int]
) -> np.ndarray:
    """(N, N) float32 additive mask: 0 where attendable, -inf elsewhere."""
    D, H, W = DHW
    coords = np.stack(
        np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # [N, 3] in (d, h, w) row-major token order
    delta = coords[None, :, :] - coords[:, None, :]  # [N, N, 3] = q - p per axis
    ks = np.asarray(local_k)
    lo = -(ks // 2)
    hi = ks - 1 - ks // 2
    allowed = np.all((delta >= lo) & (delta <= hi), axis=-1)
    return np.where(allowed, 0.0, -np.inf).astype(np.float32)


def local_mask_additive(
    DHW: Tuple[int, int, int], local_k: Tuple[int, int, int]
) -> jax.Array:
    return jnp.asarray(local_mask_additive_np(tuple(DHW), tuple(local_k)))


def masked_local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    DHW: Tuple[int, int, int],
    local_k: Tuple[int, int, int],
    impl: str = "xla",
    seed: jax.Array = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """Single-head local attention over the [B, N, dl] latent stream.

    N must equal prod(DHW). ``scale`` is the caller's (the reference scales by
    the FULL model dim ** -0.5, not the latent dim — gaviko.py:201 — so it is
    passed in rather than derived here). Attention-prob dropout (the
    reference's attn_drop, gaviko.py:235-243) uses hash-derived bits from
    ``seed`` so the flash kernel and the XLA path produce IDENTICAL outputs
    for the same seed.
    """
    from gaviko_tpu.ops.flash_attention import (
        flash_local_attention,
        local_reference,
    )

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    if impl == "flash":
        return flash_local_attention(
            q, k, v, seed, scale=scale, DHW=DHW, local_k=local_k,
            dropout_rate=dropout_rate,
        )
    return local_reference(q, k, v, seed, scale, DHW, local_k, dropout_rate)
