"""Shared row-block sizing for the row-streamed kernels (fused MLP,
LN+linear).

On-chip A/B (round 3, vit-b16): block 256 wins at train row counts
(B8, rows 8064 — 512 regressed the step 45.9 -> 47.6 ms) while 512 wins at
serving row counts (B32, rows 32256 — 45.62 -> 45.23 ms with both kernels
at 512). The crossover is the grid length: longer row grids amortize the
VMEM-resident weights over deeper pipelines. Env overrides are kept for
A/B work.

Divisibility matters too (round-3 session 7 device trace): when the block
does not divide the row count, every kernel call pays an XLA pad of the
row dim + a slice back — 22 pad ops/step (~0.34 ms of pad alone) on the
B8 train step, where rows = 8*1008 = 8064 = 31.5 x 256. Among the
divisors of 8064, the on-chip sweep ranked 336 (189.1 vol/s) > 224
(188.3) > padded 256 (187.0) > 288 (184.9) > 504/672 (184-185) > 448
(182.0). At B16 (rows 16128 = 63*256, i.e. NO pad at 256) plain 256
still beats 336 (198.5 vs 196.4 vol/s) — so 256 stays preferred whenever
it divides, with 336 as the measured fallback divisor for the B8-shaped
row counts.
"""

from __future__ import annotations

import os

_WIDE_ROWS = 16384


def row_block(rows: int, env: str) -> int:
    """Measured-best row-block size for a row-streamed kernel.

    ``env`` (e.g. ``GAVIKO_MLP_BLOCK``) overrides when set.
    """
    v = os.environ.get(env)
    if v:
        return int(v)
    if rows >= _WIDE_ROWS:
        return 512
    if rows % 256 and rows % 336 == 0:
        return 336  # pad-free divisor block (see sweep in the module doc)
    return 256
