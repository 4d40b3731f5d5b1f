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


def save_pt(path: str, state: Mapping[str, np.ndarray]) -> None:
    import torch

    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in state.items()},
        path,
    )


def load_pt(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # copy: torch-tensor-backed views must not alias into jax zero-copy buffers
    return {k: np.array(v, copy=True) for k, v in sd.items()}


def save_npz(path: str, state: Mapping[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in state.items()})


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    return load_pt(path)
