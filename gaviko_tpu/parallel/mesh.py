"""Multi-chip scaling: device mesh, sharding rules, sharded train step.

The reference's only distribution story is optional DeepSpeed ZeRO-2 data
parallelism over NCCL (ref: src/train.py:232-243, configs/deepspeed.yaml;
disabled in every config). The TPU-native equivalent is a global
``jax.sharding.Mesh`` + jit sharding annotations; XLA GSPMD inserts the
collectives (gradient psum over the ``data`` axis = DDP/ZeRO gradient sync;
weight all-gathers over ``model`` = tensor parallelism), and they ride ICI
within a slice / DCN across slices with no backend code here.

Supported axes:
- ``data``: batch sharding (DP). Gradients sync via GSPMD-inserted psum.
- ``model``: tensor parallelism over attention heads / MLP hidden dim,
  expressed as per-parameter PartitionSpecs on the torch-layout (out, in)
  weights.
- ZeRO-style optimizer sharding: Adam moments sharded over ``data`` on the
  largest divisible axis (the DeepSpeed-ZeRO equivalent for a framework
  whose models are small enough to replicate params).

Pipeline parallelism is intentionally absent: the largest backbone (vit-l16,
~0.3B params) fits comfortably on one chip (SURVEY.md §2.4).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_multihost(par_cfg: dict) -> Tuple[int, int]:
    """Guarded ``jax.distributed.initialize`` for multi-host pods (DCN).

    The reference's analog is DeepSpeed's (never-exercised) multi-process
    launch (ref: src/train.py:232-243). Enabled via
    ``train.parallel.multihost: true``. Topology comes from, in order:
    explicit config keys (``parallel.coordinator_address`` /
    ``num_processes`` / ``process_id``), the ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars, or JAX's cluster
    auto-detection (TPU pod metadata / SLURM / OpenMPI).

    Failure semantics: when a multi-process topology was EXPLICITLY
    requested (num_processes > 1 via config/env), an init failure raises —
    silently training a 1/N shard of the data would be wrong. With no
    explicit topology (bare ``multihost: true`` relying on auto-detection),
    failure degrades to single-process with a warning, so the same YAML
    runs on a laptop. Exercised for real by the 2-process CPU run in
    tests/test_multihost.py / scripts/multihost_dryrun.py.

    Returns (process_index, process_count).
    """
    if par_cfg.get("multihost"):
        import logging
        import os

        def _opt(key: str, env: str):
            v = par_cfg.get(key)
            return os.environ.get(env) if v is None else v

        kwargs = {}
        addr = _opt("coordinator_address", "JAX_COORDINATOR_ADDRESS")
        nproc = _opt("num_processes", "JAX_NUM_PROCESSES")
        pid = _opt("process_id", "JAX_PROCESS_ID")
        if addr is not None:
            kwargs["coordinator_address"] = str(addr)
        if nproc is not None:
            kwargs["num_processes"] = int(nproc)
        if pid is not None:
            kwargs["process_id"] = int(pid)
        explicit = kwargs.get("num_processes", 1) > 1
        try:
            jax.distributed.initialize(**kwargs)
        except Exception as e:  # noqa: BLE001
            already = "already initialized" in str(e).lower()
            if explicit and not already:
                raise RuntimeError(
                    f"multi-host init failed for an explicitly requested "
                    f"{kwargs.get('num_processes')}-process topology: {e}. "
                    f"Refusing to continue single-process (each process "
                    f"would silently train on a 1/N data shard)."
                ) from e
            if not already:
                logging.warning(
                    f"jax.distributed.initialize failed ({e}); continuing "
                    f"single-process."
                )
    return jax.process_index(), jax.process_count()


def make_global_batch_fn(mesh: Mesh):
    """-> fn(inputs, labels) assembling global arrays over the ``data`` axis.

    Single-process: identity (jit's in_shardings place the batch).
    Multi-host: each process passes its host-local batch shard and gets the
    global jax.Array view via ``jax.make_array_from_process_local_data``.
    """
    if jax.process_count() == 1:
        return lambda inputs, labels: (inputs, labels)
    bsh = NamedSharding(mesh, P("data"))

    def fn(inputs, labels):
        return (
            jax.make_array_from_process_local_data(bsh, np.asarray(inputs)),
            jax.make_array_from_process_local_data(bsh, np.asarray(labels)),
        )

    return fn


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs {data * model} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


# --- tensor-parallel partition rules over torch-layout (out, in) weights ---

_TP_RULES = [
    # Attention: qkv rows (inner*3) split over heads; out-proj contracts over
    # inner -> shard its input dim.  (Matches Megatron-style head sharding.)
    (re.compile(r"\.to_qkv(\.qkv)?\.weight$"), P("model", None)),
    (re.compile(r"\.to_out\.0\.weight$"), P(None, "model")),
    # MLP: fc1 rows sharded, fc2 input dim sharded.
    (re.compile(r"\.net\.1\.weight$"), P("model", None)),
    (re.compile(r"\.net\.1\.bias$"), P("model")),
    (re.compile(r"\.net\.4\.weight$"), P(None, "model")),
]


def param_pspec(name: str, value, tp: bool) -> P:
    if tp:
        for pat, spec in _TP_RULES:
            if pat.search(name):
                # Only shard if the dimension divides evenly; fall back to
                # replication otherwise (e.g. tiny test models).
                return spec
    return P()


def shardings_for_params(params: Dict, mesh: Mesh, tp: bool = True) -> Dict:
    model_size = mesh.shape["model"]
    out = {}
    for k, v in params.items():
        spec = param_pspec(k, v, tp)
        dims = tuple(spec)
        ok = True
        for axis, name in enumerate(dims):
            if name == "model" and (axis >= v.ndim or v.shape[axis] % model_size):
                ok = False
        out[k] = NamedSharding(mesh, spec if ok else P())
    return out


def zero_sharding_for(value, mesh: Mesh) -> NamedSharding:
    """ZeRO-style: shard the largest axis divisible by the data-axis size."""
    data_size = mesh.shape["data"]
    if data_size > 1 and hasattr(value, "ndim") and value.ndim > 0:
        axes = sorted(range(value.ndim), key=lambda a: -value.shape[a])
        for a in axes:
            if value.shape[a] % data_size == 0 and value.shape[a] >= data_size:
                spec = [None] * value.ndim
                spec[a] = "data"
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def opt_state_shardings(opt_state, param_shardings: Dict, mesh: Mesh, zero: bool = True):
    """Adam moments follow ZeRO sharding over `data`; params-shaped leaves in
    scale_by_adam state are dicts keyed like params."""
    def map_state(state):
        return jax.tree.map(
            lambda v: zero_sharding_for(v, mesh) if zero and hasattr(v, "shape") and v.ndim > 0
            else NamedSharding(mesh, P()),
            state,
        )

    return map_state(opt_state)


def make_parallel_train_step(
    model,
    criterion,
    tx,
    mesh: Mesh,
    trainable: Dict,
    frozen: Dict,
    opt_state,
    *,
    tp: bool = True,
    zero: bool = True,
    compute_dtype=jnp.float32,
    device_augment: bool = False,
    fused=None,
):
    """Places state on the mesh and returns (train_step, placed_state).

    train_step(trainable, opt_state, frozen, inputs, labels, rng) with the
    batch sharded over ``data`` and weights sharded per the TP rules; GSPMD
    inserts the gradient psum / activation collectives.
    """
    t_sh = shardings_for_params(trainable, mesh, tp)
    f_sh = shardings_for_params(frozen, mesh, tp)
    o_sh = opt_state_shardings(opt_state, t_sh, mesh, zero)
    batch_sh = NamedSharding(mesh, P("data"))
    label_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    trainable = {k: jax.device_put(v, t_sh[k]) for k, v in trainable.items()}
    frozen = {k: jax.device_put(v, f_sh[k]) for k, v in frozen.items()}
    opt_state = jax.tree.map(
        lambda v, s: jax.device_put(v, s) if hasattr(v, "shape") else v,
        opt_state, o_sh,
    )

    def loss_fn(trainable, frozen, inputs, labels, rng):
        params = {**frozen, **trainable}
        if compute_dtype != jnp.float32:
            # Mirror make_steps.forward: fp32 master params, compute-dtype
            # cast at use (grads flow back fp32 via the cast's transpose).
            params = jax.tree.map(
                lambda t: t.astype(compute_dtype)
                if t.dtype == jnp.float32 else t,
                params,
            )
        if device_augment:
            from gaviko_tpu.ops.augment import train_augment

            rng, aug_rng = jax.random.split(rng)
            inputs = train_augment(inputs, aug_rng)
        logits = model.apply(
            params, inputs.astype(compute_dtype), model.spec, train=True, rng=rng
        )
        return criterion(logits.astype(jnp.float32), labels), logits

    def _step(trainable, opt_state, frozen, inputs, labels, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, inputs, labels, rng
        )
        from gaviko_tpu.train.loop import apply_optimizer

        trainable, opt_state = apply_optimizer(
            tx, fused, grads, opt_state, trainable
        )
        correct = jnp.sum(jnp.argmax(logits.astype(jnp.float32), axis=1) == labels)
        return trainable, opt_state, loss, correct

    step = jax.jit(
        _step,
        in_shardings=(t_sh, o_sh, f_sh, batch_sh, label_sh, rep),
        out_shardings=(t_sh, o_sh, rep, rep),
        donate_argnums=(0, 1),
    )

    def _eval_step(trainable, frozen, inputs, labels):
        params = {**frozen, **trainable}
        if compute_dtype != jnp.float32:
            params = jax.tree.map(
                lambda t: t.astype(compute_dtype)
                if t.dtype == jnp.float32 else t,
                params,
            )
        if device_augment:
            # device_augment mode feeds RAW volumes; eval applies the
            # deterministic intensity rescale on-device, mirroring
            # make_steps.forward (train/loop.py) — without it validation
            # would run on unrescaled inputs and best-checkpoint / early-stop
            # decisions would be garbage.
            from gaviko_tpu.ops.augment import eval_rescale

            inputs = eval_rescale(inputs)
        logits = model.apply(
            params, inputs.astype(compute_dtype), model.spec
        ).astype(jnp.float32)
        loss = criterion(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, axis=1) == labels)
        return loss, correct, logits

    # Sharded eval: same placements as the train step, so validation batches
    # ride the mesh instead of being re-replicated through jit defaults.
    eval_step = jax.jit(
        _eval_step,
        in_shardings=(t_sh, f_sh, batch_sh, label_sh),
        out_shardings=(rep, rep, rep),
    )
    return step, eval_step, (trainable, frozen, opt_state)
