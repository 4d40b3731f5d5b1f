"""A/B the fused-MLP row block on the bench-exact B8 train chain.

Motivation (round-3 session 7 device trace): block 256 does not divide the
train row count (B8 x 1008 tokens = 8064 rows), so every fused_mlp call pays
an XLA pad to 8192 rows + a slice back (~0.34 ms/step of pad alone, plus
copies). Blocks 224/288/336 divide 8064 exactly — no pad ops at all. This
probe measures whether the divisor blocks beat the measured-optimal 256
once the pad savings are counted.

Run with GAVIKO_KPAD128=1 for fast patchify compiles while iterating; the
winner must be re-verified at default (exact-stripe) patchify.

    GAVIKO_KPAD128=1 python scripts/mlp_block_ab.py [blocks...]
"""

from __future__ import annotations

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    blocks = [int(a) for a in sys.argv[1:]] or [256, 288, 224, 336]
    import bench

    for b in blocks:
        os.environ["GAVIKO_MLP_BLOCK"] = str(b)
        vols = bench.bench_train_b16()
        print(f"block {b}: {vols:.1f} vol/s ({8 / vols * 1000:.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
