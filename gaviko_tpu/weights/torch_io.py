""".pt checkpoint interop (torch CPU) + npz fallback.

The reference's checkpoint contract: the best-val checkpoint holds ONLY the
trainable parameters, filtered by name (ref: src/train.py:472-483); eval and
inference rebuild full weights as {**timm_vanilla, **checkpoint}
(load_pretrained.py:150-156). We keep the same payload + the same .pt
container so checkpoints interoperate with the reference both ways.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _to_torch(v: np.ndarray):
    """numpy -> torch, handling bfloat16 (ml_dtypes) which torch.from_numpy
    rejects outright. pure_bf16 training keeps trainable params in bf16; the
    best checkpoint must still save (and stay a torch-loadable bf16 tensor,
    like a torch run with .bfloat16() weights would produce)."""
    import torch

    v = np.array(v, copy=True)
    if v.dtype == np.dtype("bfloat16"):
        return torch.from_numpy(v.view(np.uint16)).view(torch.bfloat16)
    return torch.from_numpy(v)


def save_pt(path: str, state: Mapping[str, np.ndarray]) -> None:
    import torch

    torch.save({k: _to_torch(v) for k, v in state.items()}, path)


def load_pt(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # copy: torch-tensor-backed views must not alias into jax zero-copy
    # buffers. torch bf16 tensors round-trip through a uint16 view (numpy
    # can't convert them directly either way).
    out = {}
    for k, v in sd.items():
        if v.dtype == torch.bfloat16:
            out[k] = (
                v.view(torch.uint16).numpy().copy().view(np.dtype("bfloat16"))
            )
        else:
            out[k] = np.array(v, copy=True)
    return out


def save_npz(path: str, state: Mapping[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in state.items()})


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    return load_pt(path)
