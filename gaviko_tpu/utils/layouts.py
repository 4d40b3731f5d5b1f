"""Host->device transfers pinned to row-major (descending) layout.

XLA's *default* TPU layout for 5D NCDHW volumes like (B, 1, 120, 160, 160)
is {2,4,3,0,1}: the depth axis becomes the 128-lane dimension (padded
120->128). Every Pallas custom call constrains its operands to the
descending layout {4,3,2,1,0}, so a default-layout input buffer forces XLA
to insert a physical relayout copy of the whole volume INSIDE the jitted
program — measured 0.84 ms per 196 MB batch-32 on v5e, ~2% of the forward.

Descending layout IS natural numpy order, so transferring a host batch
directly into it is a straight DMA (no host-side shuffle). This helper makes
the deliberate choice: commit input volumes in descending layout so the
compiled graphs start from the layout the kernels want.

No reference analog (torch tensors are always row-major; the quirk is purely
an XLA layout-assignment artifact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pinning_enabled() -> bool:
    """Pinned-layout entries are intermittently REJECTED by the axon relay
    (INVALID_ARGUMENT after runs that previously succeeded — observed at
    B32 in the round-3 probe matrix and reproduced at B8 in a real training
    epoch, where GAVIKO_PINNED=0 cleanly fixed it). The relay identifies
    itself in platform_version, so pinning defaults OFF there (cost: the
    in-graph relayout copy, 0.84 ms per B32 batch) and ON for directly
    attached TPU hosts. GAVIKO_PINNED=1/0 overrides either way."""
    import os

    env = os.environ.get("GAVIKO_PINNED")
    if env is not None:
        return env != "0"
    global _PIN_DEFAULT
    if _PIN_DEFAULT is None:
        version = getattr(jax.devices()[0].client, "platform_version", "")
        _PIN_DEFAULT = "axon" not in version
    return _PIN_DEFAULT


_PIN_DEFAULT = None


def put_volume(x, dtype=None) -> jax.Array:
    """Transfer a host batch to device in row-major (descending) layout.

    ``x``: numpy array (any rank). ``dtype``: optional target dtype — the
    cast happens on HOST so the device buffer is created directly in the
    pinned layout (a device-side ``astype`` would re-materialize the default
    layout and resurrect the in-graph copy).

    Already-committed ``jax.Array`` inputs are returned as-is when no cast
    is needed (relayout at the jit boundary is then the caller's problem —
    all production paths feed numpy).
    """
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        return x if dtype is None else x.astype(dtype)
    x = np.asarray(x)
    if dtype is not None and x.dtype != dtype:
        x = x.astype(dtype)
    if (jax.default_backend() != "tpu" or x.ndim < 3
            or not _pinning_enabled()):
        # CPU/interpret runs and low-rank arrays (labels) don't suffer the
        # relayout; plain transfer keeps tests on the default path.
        return jnp.asarray(x)
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    fmt = Format(
        Layout(major_to_minor=tuple(range(x.ndim))),
        SingleDeviceSharding(jax.devices()[0]),
    )
    return jax.device_put(x, fmt)
