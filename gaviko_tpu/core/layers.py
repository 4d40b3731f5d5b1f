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

    Op-count note: a vit-b16 training forward consumes ~38 sites and a
    GAViKO vit-l16 forward >100; deriving each key (threefry fold_in) and
    each kernel seed (a second threefry in ``seed_from_key``) as a separate
    scalar op contributed measurably to the train step's ~3300-tiny-op
    dispatch tail. Keys and seeds are therefore derived in vectorized
    blocks — ONE batched threefry per 64 sites — and handed out by static
    indexing. ``next()`` returns bit-identical keys to the per-site
    ``fold_in(key, count)`` it replaces (vmap of fold_in over the counts),
    so every existing mask/checkpoint replay is unchanged.
    """

    _BLOCK = 64

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._count = 0
        self._keys = None   # (M,)-batched fold_in(key, 1..M)
        self._seeds = None  # int32 kernel seeds of those keys

    def _ensure(self, n: int) -> None:
        if self._keys is not None and n <= self._keys.shape[0]:
            return
        m = -(-n // self._BLOCK) * self._BLOCK
        idx = jnp.arange(1, m + 1, dtype=jnp.uint32)
        self._keys = jax.vmap(
            lambda i: jax.random.fold_in(self._key, i))(idx)
        self._seeds = jax.lax.bitcast_convert_type(
            jax.vmap(lambda k: jax.random.bits(k, (), jnp.uint32))(self._keys),
            jnp.int32,
        )

    def next(self) -> jax.Array:
        """The key ``fold_in(base_key, count)`` for this site."""
        if self._key is None:
            raise ValueError("dropout requested but no rng key was provided")
        self._count += 1
        self._ensure(self._count)
        return self._keys[self._count - 1]

    def next_seed(self) -> jax.Array:
        """int32 kernel seed == ``seed_from_key(self.next())``, from the
        same batched derivation (consumes one site like ``next()``)."""
        if self._key is None:
            raise ValueError("dropout requested but no rng key was provided")
        self._count += 1
        self._ensure(self._count)
        return self._seeds[self._count - 1]


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


def gelu_spec(x: jax.Array, mode: str) -> jax.Array:
    """XLA-path GELU honoring ``spec.gelu``: 'exact' uses the true erf
    (only Mosaic kernels need an erf substitute), 'tanh' the torch tanh
    approximation, 'erf_fast' the tanh-form erf fit (5.5e-5 max GELU
    error, 2.2e-6 full-depth fp32 logit MAE — see ops/fused_mlp.py)."""
    if mode == "erf_fast":
        from gaviko_tpu.ops.fused_mlp import gelu_erf_fast_f32

        return gelu_erf_fast_f32(x)
    return jax.nn.gelu(x, approximate=(mode == "tanh"))


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
    from gaviko_tpu.ops.hash_dropout import keep_mask

    seed = rngs.next_seed()
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
