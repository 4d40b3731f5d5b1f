"""Mid-training resume state (a capability the reference lacks entirely —
SURVEY.md §5 'no mid-training resume': its checkpoints hold trainable params
only, no optimizer/scheduler state).

The full train state (trainable params, optax state, step counters, best-val
bookkeeping, PRNG seed) is serialized to a single .npz: pytrees are
flattened to leaves; on load the structure comes from a freshly-initialized
template built from the same config, so the file format is independent of
optax internals.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import numpy as np


def save_train_state(path: str, trainable: Dict, opt_state: Any, meta: Dict) -> None:
    payload = {}
    for k, v in trainable.items():
        payload[f"param::{k}"] = np.asarray(v)
    leaves = jax.tree.leaves(opt_state)
    for i, leaf in enumerate(leaves):
        payload[f"opt::{i}"] = np.asarray(leaf)
    payload["meta::json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **payload)


def save_train_state_orbax(path: str, trainable: Dict, opt_state: Any, meta: Dict) -> None:
    """Orbax backend (train.checkpoint_backend: orbax) — same payload, a
    directory checkpoint instead of one .npz."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {"trainable": dict(trainable),
             "opt_leaves": list(jax.tree.leaves(opt_state)),
             # StandardCheckpointer rejects raw strings; encode as bytes
             "meta_json": np.frombuffer(json.dumps(meta).encode(), np.uint8).copy()},
            force=True,
        )


def load_train_state_orbax(
    path: str, trainable_template: Dict, opt_state_template: Any
) -> Tuple[Dict, Any, Dict]:
    import orbax.checkpoint as ocp

    t_leaves, treedef = jax.tree.flatten(opt_state_template)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    trainable = {k: jax.numpy.asarray(v) for k, v in restored["trainable"].items()}
    opt_state = jax.tree.unflatten(
        treedef, [jax.numpy.asarray(v) for v in restored["opt_leaves"]]
    )
    meta = json.loads(bytes(np.asarray(restored["meta_json"]).astype(np.uint8)).decode())
    return trainable, opt_state, meta


def load_train_state(
    path: str, trainable_template: Dict, opt_state_template: Any
) -> Tuple[Dict, Any, Dict]:
    with np.load(path) as z:
        trainable = {}
        for k in trainable_template:
            arr = z[f"param::{k}"]
            assert arr.shape == tuple(trainable_template[k].shape), k
            trainable[k] = jax.numpy.asarray(arr)
        t_leaves, treedef = jax.tree.flatten(opt_state_template)
        leaves = []
        for i, tmpl in enumerate(t_leaves):
            arr = z[f"opt::{i}"]
            leaves.append(jax.numpy.asarray(arr).astype(np.asarray(tmpl).dtype))
        opt_state = jax.tree.unflatten(treedef, leaves)
        meta = json.loads(bytes(z["meta::json"]).decode())
    return trainable, opt_state, meta


def tree_to_host(tree):
    """Fetch a pytree of (possibly multi-host-sharded) arrays to host numpy.

    Single-process / fully-addressable leaves are a plain ``np.asarray``.
    Leaves sharded across processes (ZeRO optimizer moments over a mesh
    spanning hosts) are materialized via
    ``multihost_utils.process_allgather`` — a COLLECTIVE, so every process
    must call this even when only process 0 writes the resulting file.
    """

    def fetch(v):
        if isinstance(v, jax.Array) and not v.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(v, tiled=True))
        return np.asarray(v)

    return jax.tree.map(fetch, tree)
