"""Parameter initializers replicating PyTorch's default + reference-custom inits.

Parity note (SURVEY.md §3.5): because the reference's timm remap only matches
GAViKO's module names, the other models' attention/MLP blocks keep *torch
default random init* in the reference. Exact-logit parity therefore never
relies on RNG equality — the parity harness serializes the torch model's actual
initial state. These initializers only need to be *distributionally* faithful
so that standalone training from scratch behaves like the reference.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kaiming_uniform(key, shape, fan_in: int, a: float = math.sqrt(5.0), dtype=jnp.float32):
    """torch nn.init.kaiming_uniform_: U(-bound, bound), bound = sqrt(6/((1+a^2) fan_in))."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_weight(key, out_features: int, in_features: int, dtype=jnp.float32):
    """torch nn.Linear default weight init (kaiming_uniform a=sqrt(5))."""
    return kaiming_uniform(key, (out_features, in_features), in_features, dtype=dtype)


def torch_linear_bias(key, out_features: int, in_features: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
    return jax.random.uniform(key, (out_features,), dtype, minval=-bound, maxval=bound)


def torch_conv3d_weight(key, out_ch: int, in_ch: int, kdhw: Tuple[int, int, int], dtype=jnp.float32):
    kd, kh, kw = kdhw
    fan_in = in_ch * kd * kh * kw
    return kaiming_uniform(key, (out_ch, in_ch, kd, kh, kw), fan_in, dtype=dtype)


def torch_conv3d_bias(key, out_ch: int, in_ch: int, kdhw: Tuple[int, int, int], dtype=jnp.float32):
    kd, kh, kw = kdhw
    fan_in = in_ch * kd * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (out_ch,), dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ with torch's fan computation:
    fan_out = shape[0] * prod(shape[2:]), fan_in = shape[1] * prod(shape[2:])."""
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_out = shape[0] * receptive
    fan_in = shape[1] * receptive
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def orthogonal(key, shape, gain: float = 1.0, dtype=jnp.float32):
    return gain * jax.nn.initializers.orthogonal()(key, shape, dtype)


def trunc_normal(key, shape, std: float, clamp_mult: float = 2.0, dtype=jnp.float32):
    """Normal(0, std) then clamp to +-clamp_mult*std (ref: gaviko.py:455-456
    draws normal then clamps — NOT a resampled truncated normal)."""
    x = std * jax.random.normal(key, shape, dtype)
    return jnp.clip(x, -clamp_mult * std, clamp_mult * std)


def timm_style_trunc_normal(key, shape, std: float = 0.02, a: float = -2.0, b: float = 2.0, dtype=jnp.float32):
    """True truncated normal via inverse-CDF (ref: evp.py:165-218)."""
    l = (1.0 + math.erf((a - 0.0) / std / math.sqrt(2.0))) / 2.0
    u = (1.0 + math.erf((b - 0.0) / std / math.sqrt(2.0))) / 2.0
    un = jax.random.uniform(key, shape, jnp.float32, minval=2 * l - 1, maxval=2 * u - 1)
    x = jax.scipy.special.erfinv(un) * std * math.sqrt(2.0)
    return jnp.clip(x, a, b).astype(dtype)


class KeyGen:
    """Sequential key derivation from one base key."""

    def __init__(self, key: jax.Array):
        self._key = key
        self._n = 0

    def __call__(self) -> jax.Array:
        self._n += 1
        return jax.random.fold_in(self._key, self._n)
