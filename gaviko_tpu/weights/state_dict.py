"""state_dict interop: load/merge flat name->array dicts into model params.

Because our params use the reference's state_dict names verbatim, loading is
name-intersection with torch ``load_state_dict(strict=False)`` semantics
(missing/unexpected keys ignored, shape mismatch is an error). This is what
makes the reference's two silent-drop behaviors (SURVEY.md §3.5) fall out
naturally: the converter may emit keys (e.g. ``to_qkv.bias``, or GAViKO-style
``transformer.attns.*``) that simply don't exist in a given model's params and
are dropped here, exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Tuple

import jax.numpy as jnp
import numpy as np


def load_state_dict(
    params: Dict[str, jnp.ndarray],
    state: Mapping[str, np.ndarray],
    strict: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], list, list]:
    """Returns (new_params, missing_keys, unexpected_keys)."""
    new = dict(params)
    missing = [k for k in params if k not in state]
    unexpected = [k for k in state if k not in params]
    for k, v in state.items():
        if k not in params:
            continue
        v = np.asarray(v)
        if tuple(v.shape) != tuple(params[k].shape):
            raise ValueError(
                f"size mismatch for {k}: checkpoint {v.shape} vs model "
                f"{tuple(params[k].shape)}"
            )
        new[k] = jnp.asarray(v, dtype=params[k].dtype)
    if strict and (missing or unexpected):
        raise KeyError(f"missing={missing} unexpected={unexpected}")
    return new, missing, unexpected


def filter_state(state: Mapping[str, np.ndarray], names: Iterable[str]) -> Dict[str, np.ndarray]:
    """Trainable-only checkpoint payload (ref: train.py:472-483)."""
    names = set(names)
    return {k: v for k, v in state.items() if k in names}


def merge_states(vanilla: Mapping, ckpt: Mapping) -> Dict:
    """{**vanilla, **ckpt} merge (ref: load_pretrained.py:150-156)."""
    return {**dict(vanilla), **dict(ckpt)}
