"""Shared row-block sizing for the row-streamed kernels (fused MLP,
LN+linear).

On-chip A/B (round 3, vit-b16): block 256 wins at train row counts
(B8, rows 8064 — 512 regressed the step 45.9 -> 47.6 ms) while 512 wins at
serving row counts (B32, rows 32256 — 45.62 -> 45.23 ms with both kernels
at 512). The crossover is the grid length: longer row grids amortize the
VMEM-resident weights over deeper pipelines. Env overrides are kept for
A/B work.
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
    return 512 if rows >= _WIDE_ROWS else 256
