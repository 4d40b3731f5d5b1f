"""Functional neural-net primitives over flat parameter dicts.

Every model in this framework is a pure function ``apply(params, x, ...)``
where ``params`` is a flat ``dict[str, jax.Array]`` keyed by the PyTorch
reference's ``state_dict`` names (e.g. ``"transformer.layers.0.0.to_qkv.weight"``).
Linear weights keep the torch ``(out_features, in_features)`` layout so
converted checkpoints load without transposition; XLA folds the transpose
into the matmul on the MXU.

Numerical parity notes (for <1e-4 logit MAE vs the torch reference):
- LayerNorm uses eps=1e-5 (torch nn.LayerNorm default).
- GELU is the exact erf form (torch nn.GELU default), NOT jax.nn.gelu's
  default tanh approximation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class RngStream:
    """Deterministic per-call-site PRNG key supply for dropout.

    Splitting happens at Python trace time, so under jit each dropout site
    gets a stable, distinct key derived from the base key.
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._count = 0

    def next(self) -> jax.Array:
        if self._key is None:
            raise ValueError("dropout requested but no rng key was provided")
        self._count += 1
        return jax.random.fold_in(self._key, self._count)


def linear(p: Params, prefix: str, x: jax.Array) -> jax.Array:
    """y = x @ W^T + b with torch (out, in) weight layout."""
    w = p[f"{prefix}.weight"]
    y = x @ w.T
    b = p.get(f"{prefix}.bias")
    if b is not None:
        y = y + b
    return y


def layer_norm(p: Params, prefix: str, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Reduce in f32 for bf16 stability; cast back to the compute dtype.
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(dtype)
    return y * p[f"{prefix}.weight"] + p[f"{prefix}.bias"]


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (ref: gaviko.py:15-17, dvpt.py:21-23)."""
    return x * jax.nn.sigmoid(1.702 * x)


def dropout(x: jax.Array, rate: float, enabled: bool, rngs: Optional[RngStream]) -> jax.Array:
    """Inverted dropout; no-op when disabled or rate == 0.

    Bits come from the portable coordinate hash (ops/hash_dropout.py), not
    jax.random.bernoulli: threefry costs ~100 VPU ops per element on TPU and
    the 13 XLA dropout sites of a vit-b16 training step were measurable in
    the step time. One rng key is still consumed per call site, so the
    RngStream alignment (and therefore every other site's randomness) is
    unchanged.
    """
    if not enabled or rate == 0.0:
        return x
    from gaviko_tpu.ops.hash_dropout import keep_mask, seed_from_key

    seed = seed_from_key(rngs.next())
    keep = 1.0 - rate
    flat = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
    mask = keep_mask(flat.shape, seed, rate).reshape(x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def ssf_ada(x: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
    """Scale-and-shift along the channel dim (ref: ssf.py:24-31)."""
    assert scale.shape == shift.shape
    if x.shape[-1] == scale.shape[0]:
        return x * scale + shift
    elif x.ndim >= 2 and x.shape[1] == scale.shape[0]:
        sh = (1, -1) + (1,) * (x.ndim - 2)
        return x * scale.reshape(sh) + shift.reshape(sh)
    raise ValueError(
        "the input tensor shape does not match the shape of the scale factor."
    )
