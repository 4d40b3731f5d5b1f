"""Multi-head self-attention for the 3D ViT token stream.

Two interchangeable implementations:
- ``xla``: straightforward reference path (materializes the N x N scores);
  used for parity checks and for training paths that need attention-prob
  dropout.
- ``flash``: blockwise Pallas kernel (ops/flash_attention.py) that never
  materializes N^2 in HBM; the default on TPU for inference and
  dropout-free training.

Semantics match the reference Attention module (ref:
src/model/vision_transformer.py:40-72): pre-norm happens in the caller;
here we take q/k/v already projected, scale = dim_head ** -0.5, softmax,
optional dropout on the attention probabilities, weighted sum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaviko_tpu.core.layers import RngStream, dropout

def _initial_impl() -> str:
    """Pallas kernels compiled on TPU; XLA path on CPU (tests/virtual mesh),
    where the kernels would only run in slow interpret mode."""
    import jax

    try:
        return "flash" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


def _default_impl() -> str:
    """Resolve the default impl LAZILY: querying jax.default_backend() at
    import time initializes the XLA backend, which breaks
    ``jax.distributed.initialize`` (must run before any backend init —
    found by the 2-process run in scripts/multihost_dryrun.py)."""
    impl = globals().get("_DEFAULT_IMPL")
    if impl is None:
        impl = _initial_impl()
        globals()["_DEFAULT_IMPL"] = impl
    return impl


def __getattr__(name: str):
    # Keep the historical `attn_mod._DEFAULT_IMPL` read surface (models/
    # tests/bench) while deferring backend detection to first use.
    if name == "_DEFAULT_IMPL":
        return _default_impl()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def set_default_impl(impl: str) -> None:
    assert impl in ("xla", "flash")
    globals()["_DEFAULT_IMPL"] = impl


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_enabled: bool = False,
    rngs: Optional[RngStream] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """q, k, v: [B, H, N, Dh] -> [B, H, N, Dh]."""
    impl = impl or _default_impl()
    use_dropout = dropout_enabled and dropout_rate > 0.0
    if impl == "flash" and not use_dropout:
        from gaviko_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(
        q, k, v, scale=scale, dropout_rate=dropout_rate,
        dropout_enabled=use_dropout, rngs=rngs,
    )


def _xla_attention(q, k, v, *, scale, dropout_rate, dropout_enabled, rngs):
    dots = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    attn = dropout(attn, dropout_rate, dropout_enabled, rngs)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)
