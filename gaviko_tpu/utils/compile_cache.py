"""Persistent XLA compilation cache (environment-usability; no reference analog).

Big train graphs take minutes to compile through the axon relay (vit-b16 train
~287 s, vit-l16 ~10 min). JAX's persistent compilation cache makes every
*repeat* compile a disk read. Entry points (train/eval/inference/serve/bench)
call :func:`enable_compilation_cache` before building any jitted function.

Opt out with ``GAVIKO_COMPILE_CACHE=0`` or ``enable_compilation_cache(None)``
after setting ``GAVIKO_COMPILE_CACHE_DIR`` to an explicit location.
"""

from __future__ import annotations

import logging
import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "gaviko_tpu", "xla_cache",
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = _DEFAULT_DIR) -> str | None:
    """Turn on JAX's persistent compilation cache. Idempotent.

    Returns the cache directory in use, or None if disabled (either by the
    ``GAVIKO_COMPILE_CACHE=0`` env escape hatch or cache_dir=None).
    """
    global _enabled
    if cache_dir is None or os.environ.get("GAVIKO_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = os.environ.get("GAVIKO_COMPILE_CACHE_DIR", cache_dir)
    if _enabled:
        return cache_dir
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: the relay makes even small compiles cost seconds.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception as e:  # unknown flag on an old jax — degrade gracefully
        logging.getLogger(__name__).warning("compilation cache unavailable: %s", e)
        return None
    return cache_dir
