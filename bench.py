"""Headline benchmark: vit-b16 inference throughput (volumes/sec/chip).

Workload: the reference's vit-b16 backbone at (1, 120, 160, 160) — 1000
patches + cls, 12 layers (BASELINE.md "workload shape") — batched inference
in bf16 with the Pallas fused-attention path.

Methodology: the axon relay adds ~25 ms fixed overhead per dispatch, so a
single timed call under-reports the chip. We chain ITERS forwards inside one
jit with a data dependence between iterations (defeats loop-invariant
hoisting) and report per-forward time.

Baseline for ``vs_baseline``: the north-star target is >= 5x an A100 running
the PyTorch reference (BASELINE.json). The reference publishes no numbers;
from its eager fp16 non-flash implementation (~215 GFLOP/volume forward,
typical eager-mode A100 utilization) we estimate ~150 vol/s on A100, making
the target 750 vol/s. vs_baseline = measured / 750.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 32
ITERS = 10
TARGET_VOL_PER_S = 750.0  # 5x estimated A100 reference throughput


def main():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1,
        # Deployment config: tanh GELU (erf costs ~6 ms/fwd on the VPU; the
        # difference is below bf16 resolution — see PARITY.md).
        gelu="tanh",
    )
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t, params
    )
    vol = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, 1, 120, 160, 160)
    ).astype(jnp.bfloat16)

    def chain(params, x):
        def body(i, x):
            out = model.apply(params, x, model.spec)
            return x + out[0, 0].astype(x.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, ITERS, body, x)[0, 0, 0, 0, 0]

    g = jax.jit(chain)
    float(g(params, vol))  # compile + warm up
    t0 = time.time()
    float(g(params, vol))
    dt = (time.time() - t0) / ITERS
    vol_per_s = BATCH / dt

    print(json.dumps({
        "metric": "vit-b16 MRI inference throughput (120x160x160, bf16, batch 32)",
        "value": round(vol_per_s, 1),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vol_per_s / TARGET_VOL_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
