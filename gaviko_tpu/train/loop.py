"""Training loop: jitted TPU train/eval steps + the reference's orchestration.

TPU-first structure (vs the reference's eager loop, src/train.py:257-495):
- params split into trainable/frozen dicts; gradients only flow to the
  trainable side (the PEFT contract), frozen side is closure-constant
- one jitted ``train_step`` with donated (trainable, opt_state) buffers;
  optax chain = global-norm clip 1.0 -> Adam(OneCycleLR schedule)
- metric scalars (loss, #correct) come back per step; the CSV logger keeps
  the reference's 15 fields and per-step cadence

Reference quirks preserved or flagged:
- per-step acc/loss normalize by ``len(ds) * (epoch + 1)``
  (train.py:329-330, 411-412) — reproduced in the CSV fields;
- the reference logs ``lr`` as a constant 3e-4 fallback (train.py:321); we
  log the real schedule value (flagged divergence, strictly more useful);
- best-checkpoint = trainable-params-only state dict, gated on
  val_acc > save_threshold, named
  ``{method}_{backbone}_best_model_epoch{E}_acc{ACC:.4f}.pt`` (train.py:460-483);
- early stopping after ``patience`` stale epochs (train.py:487-492).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaviko_tpu.models.factory import Model
from gaviko_tpu.train import schedule as schedule_lib
from gaviko_tpu.train.losses import make_criterion
from gaviko_tpu.train.preemption import PreemptionGuard
from gaviko_tpu.utils.layouts import put_volume
from gaviko_tpu.utils.logging import (
    TRAIN_LOG_FIELDS,
    CSVLogger,
    MemoryUsageLogger,
    analyze_model_computation,
    jit_cost_flops,
)
from gaviko_tpu.weights.state_dict import filter_state


def _gather_stats(step_stats):
    """One batched D2H transfer for an epoch's (loss, correct) scalars."""
    if not step_stats:
        return np.zeros(0), np.zeros(0)
    losses = np.asarray(jax.device_get(jnp.stack([s[0] for s in step_stats])))
    corrects = np.asarray(jax.device_get(jnp.stack([s[1] for s in step_stats])))
    return losses.astype(np.float64), corrects.astype(np.float64)


def split_params(model: Model, params: Dict) -> Tuple[Dict, Dict]:
    trainable = {k: v for k, v in params.items() if model.trainable(k)}
    frozen = {k: v for k, v in params.items() if not model.trainable(k)}
    return trainable, frozen


def make_optimizer(train_cfg: dict, total_steps: int):
    """Adam + OneCycle + global-norm clip (ref: train.py:185-206, 315-316).

    Notes vs the reference: its config declares ``weight_decay`` and
    ``accumulation_steps`` but the code uses neither (Adam is constructed
    without decay; no accumulation logic exists). Here accumulation_steps
    is honored via optax.MultiSteps; weight decay stays off to match the
    reference's actual optimizer.
    """
    accum = int(train_cfg.get("accumulation_steps", 1) or 1)
    sched_steps = max(total_steps // accum, 1)
    sched = schedule_lib.from_config(train_cfg["scheduler"], sched_steps)
    # torch OneCycleLR cycles Adam's beta1 by default (0.95 -> 0.85 -> 0.95,
    # inverse to the lr curve) — the reference never opts out, so neither do
    # we (scheduler.cycle_momentum: false restores fixed beta1=0.9). See
    # train/schedule.py.
    b1_sched = schedule_lib.beta1_from_config(train_cfg["scheduler"], sched_steps)
    eps = 1e-4 if train_cfg.get("fp16") else 1e-8  # ref: train.py:185-189
    if b1_sched is None:
        inner = optax.adam(learning_rate=sched, eps=eps)
    else:
        # Same state-leaf flattening as optax.adam (ScaleByAdamState +
        # schedule count), so resume files stay structurally compatible.
        inner = optax.chain(
            schedule_lib.scale_by_cycled_adam(b1_sched, eps=eps),
            optax.scale_by_learning_rate(sched),
        )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),  # ref: train.py:315-316
        inner,
    )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    # Fused clip+Adam+apply (train/fused_optim.py): same math as the chain
    # above in one elementwise pass — ~4 ms off a vit-b16 B8 step. Engaged
    # by default when no gradient accumulation is configured; opt out with
    # train.fused_optimizer: false (e.g. to restore an old optax-layout
    # resume checkpoint).
    fused = None
    if accum == 1 and train_cfg.get("fused_optimizer", True):
        fused = {"sched": sched, "clip": 1.0, "eps": eps,
                 "b1": b1_sched if b1_sched is not None else 0.9}
    return tx, sched, fused


def apply_optimizer(tx, fused, grads, opt_state, trainable):
    """One optimizer application: the fused clip+Adam pass when ``fused`` is
    set (a {sched, clip, eps} spec), the optax chain otherwise."""
    if fused is not None:
        from gaviko_tpu.train import fused_optim

        return fused_optim.step(
            grads, opt_state, trainable, fused["sched"],
            clip=fused["clip"], eps=fused["eps"],
            b1=fused.get("b1", 0.9),
        )
    updates, opt_state = tx.update(grads, opt_state, trainable)
    return optax.apply_updates(trainable, updates), opt_state


def init_opt_state(tx, fused, trainable):
    if fused is not None:
        from gaviko_tpu.train import fused_optim

        return fused_optim.init(trainable)
    return tx.init(trainable)


def make_steps(model: Model, criterion, tx, compute_dtype=jnp.float32,
               device_augment: bool = False, fused=None):
    """Build jitted train_step / eval_step closures.

    ``device_augment``: inputs arrive as RAW volumes; the affine/flip/rescale
    augmentation runs on-device inside the step (ops/augment.py) — the
    TPU-native replacement for torchio worker processes on weak hosts.
    """

    def forward(params, inputs, train, rng):
        # Mixed precision: fp32 master params, bf16 compute (params + inputs
        # cast at use; grads flow back in fp32 via the cast's transpose).
        if compute_dtype != jnp.float32:
            params = jax.tree.map(
                lambda t: t.astype(compute_dtype)
                if t.dtype == jnp.float32 else t,
                params,
            )
        if device_augment:
            from gaviko_tpu.ops.augment import eval_rescale, train_augment

            if train:
                rng, aug_rng = jax.random.split(rng)
                inputs = train_augment(inputs, aug_rng)
            else:
                inputs = eval_rescale(inputs)
        x = inputs.astype(compute_dtype)
        return model.apply(params, x, model.spec, train=train, rng=rng)

    def loss_fn(trainable, frozen, inputs, labels, rng):
        logits = forward({**frozen, **trainable}, inputs, True, rng)
        return criterion(logits.astype(jnp.float32), labels), logits

    @jax.jit
    def eval_step(trainable, frozen, inputs, labels):
        logits = forward({**frozen, **trainable}, inputs, False, None)
        logits = logits.astype(jnp.float32)
        loss = criterion(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, axis=1) == labels)
        return loss, correct, logits

    @jax.jit
    def predict_step(trainable, frozen, inputs):
        return forward({**frozen, **trainable}, inputs, False, None).astype(jnp.float32)

    def _train_step(trainable, opt_state, frozen, inputs, labels, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, inputs, labels, rng
        )
        trainable, opt_state = apply_optimizer(
            tx, fused, grads, opt_state, trainable
        )
        correct = jnp.sum(jnp.argmax(logits.astype(jnp.float32), axis=1) == labels)
        return trainable, opt_state, loss, correct

    train_step = jax.jit(_train_step, donate_argnums=(0, 1))
    return train_step, eval_step, predict_step


def run_training(config: dict, model: Model, params: Dict, loaders, time_stamp: str):
    """The epoch orchestration (ref: train.py:80-504). ``loaders`` is
    (train_loader, val_loader, train_len, val_len).

    Runs under a :class:`PreemptionGuard`: SIGTERM/SIGINT checkpoint the full
    train state at the next step boundary (mid-epoch, with the intra-epoch
    step index) and return with ``result["preempted"] = True``; a rerun with
    ``train.resume: auto`` continues from the exact next batch."""
    with PreemptionGuard() as guard:
        return _run_training(config, model, params, loaders, time_stamp, guard)


def _run_training(config: dict, model: Model, params: Dict, loaders,
                  time_stamp: str, guard: PreemptionGuard):
    train_loader, val_loader, train_len, val_len = loaders
    train_cfg = dict(config["train"])
    train_cfg.setdefault("fp16", config["model"].get("fp16", False))
    num_epochs = train_cfg["num_epochs"]
    total_steps = len(train_loader) * num_epochs

    csv_logger = CSVLogger(
        log_dir=config["utils"]["log_dir"],
        filename_prefix=f"{config['model']['method']}_training_log",
        fields=TRAIN_LOG_FIELDS,
    )
    criterion = make_criterion(train_cfg)
    tx, sched, fused = make_optimizer(train_cfg, total_steps)
    precision = train_cfg.get("precision")
    compute_dtype = (
        jnp.bfloat16 if precision in ("bf16", "pure_bf16") else jnp.float32
    )

    trainable, frozen = split_params(model, params)
    if precision == "pure_bf16":
        # The reference's primary mode is model.half(): fp16 params, grads
        # AND Adam moments (train.py:157-159, 185-189, fp16 eps 1e-4). This
        # is its TPU analog — params cast ONCE to bf16 (no per-step master
        # cast), bf16 grads, bf16 moment storage. Use with fp16: true so
        # the reference's eps rule engages.
        cast = lambda t: t.astype(jnp.bfloat16) \
            if t.dtype == jnp.float32 else t  # noqa: E731
        trainable = {k: cast(v) for k, v in trainable.items()}
        frozen = {k: cast(v) for k, v in frozen.items()}
    n_tr = sum(int(np.prod(v.shape)) for v in trainable.values())
    logging.info(
        f"There are {len(trainable)} trainable params tensors "
        f"({n_tr:,} elements); {len(frozen)} frozen tensors."
    )
    opt_state = init_opt_state(tx, fused, trainable)

    # Multi-chip: mesh-sharded DP(xTP) train step — the TPU-native stand-in
    # for the reference's optional DeepSpeed engine (train.py:232-243).
    par_cfg = train_cfg.get("parallel") or {}
    global_batch = lambda i, l: (i, l)  # noqa: E731 - multihost hook
    if par_cfg.get("enabled"):
        from gaviko_tpu.parallel.mesh import (
            make_global_batch_fn,
            make_mesh,
            make_parallel_train_step,
        )

        n_dev = len(jax.devices())
        model_ax = int(par_cfg.get("model", 1))
        data_ax = par_cfg.get("data", "auto")
        data_ax = n_dev // model_ax if data_ax == "auto" else int(data_ax)
        mesh = make_mesh(data=data_ax, model=model_ax)
        logging.info(f"Parallel training on mesh data={data_ax} x model={model_ax}")
        train_step, eval_step, (trainable, frozen, opt_state) = (
            make_parallel_train_step(
                model, criterion, tx, mesh, trainable, frozen, opt_state,
                tp=model_ax > 1, zero=par_cfg.get("zero", True),
                compute_dtype=compute_dtype,
                device_augment=train_cfg.get("device_augment", False),
                fused=fused,
            )
        )
        global_batch = make_global_batch_fn(mesh)
    else:
        train_step, eval_step, _ = make_steps(
            model, criterion, tx, compute_dtype,
            device_augment=train_cfg.get("device_augment", False),
            fused=fused,
        )

    rng = jax.random.PRNGKey(train_cfg.get("seed", 0))

    # H2D pipelining (train.h2d_prefetch, default on): stage the next
    # batch's global-batch assembly + put_volume on a background thread so
    # the transfer overlaps the current step's compute AND the loader's
    # decode (data/device_prefetch.py). Epoch wall tends to
    # max(wire, compute) instead of their sum — decisive through the axon
    # relay's 2-6 s/batch wire, free but harmless on PCIe hosts.
    h2d_prefetch = bool(train_cfg.get("h2d_prefetch", True))

    def _stage(inputs, labels):
        inputs, labels = global_batch(inputs, labels)
        return put_volume(inputs), jnp.asarray(labels)

    def _iter_staged(loader):
        if not h2d_prefetch:
            return ((_stage(i, l) + (n,)) for i, l, n in loader)
        from gaviko_tpu.data.device_prefetch import DevicePrefetcher

        return iter(DevicePrefetcher(loader, _stage))

    memory_logger = MemoryUsageLogger(verbose=train_cfg.get("memory_verbose", False))
    memory_logger.set_sizes(
        model_bytes=sum(int(v.nbytes) for v in {**frozen, **trainable}.values())
    )

    # Debug/observability (SURVEY.md §5): jit-purity NaN checking is the
    # JAX analog of a sanitizer; jax.profiler is the timeline tracer.
    if train_cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    prof_cfg = train_cfg.get("profile") or {}
    prof_start = int(prof_cfg.get("start_step", 10)) if prof_cfg.get("enabled") else -1
    prof_steps = int(prof_cfg.get("num_steps", 3))
    prof_dir = os.path.join(config["utils"]["log_dir"], "profile")

    val_acc_max = 0.0
    best_epoch = 0
    epoch_since_improvement = 0
    patience = train_cfg["patience"]
    current_epoch = 0
    start_epoch = 0
    resume_skip = 0  # batches of start_epoch already consumed pre-preemption
    val_acc = val_loss = train_acc = train_loss = 0.0
    val_step_acc = val_step_loss = train_step_acc = train_step_loss = 0.0
    train_step_n = val_step_n = 0
    flops_done = False
    batch_bytes_set = False
    best_ckpt_path = None
    global_step = 0

    # Mid-training resume (capability absent in the reference; SURVEY.md §5).
    resume_path = train_cfg.get("resume")
    method = config["model"]["method"]
    ckpt_backend = train_cfg.get("checkpoint_backend", "npz")
    resume_dir = os.path.join(train_cfg["save_dir"], "experiments", method)
    resume_name = "resume_state" if ckpt_backend == "orbax" else "resume_state.npz"
    auto_resume = os.path.join(resume_dir, resume_name)
    if resume_path == "auto" and os.path.exists(auto_resume):
        resume_path = auto_resume
    if resume_path and resume_path != "auto" and os.path.exists(resume_path):
        from gaviko_tpu.utils.checkpoint import (
            load_train_state,
            load_train_state_orbax,
        )

        loader = load_train_state_orbax if os.path.isdir(resume_path) else load_train_state
        trainable, opt_state, meta = loader(resume_path, trainable, opt_state)
        start_epoch = meta["epoch"]
        current_epoch = meta["epoch"]
        global_step = meta["global_step"]
        val_acc_max = meta["best_val_acc"]
        best_epoch = meta["best_epoch"]
        epoch_since_improvement = meta["epoch_since_improvement"]
        # Preemption states carry the intra-epoch step index; epoch-boundary
        # states (and pre-preemption checkpoints) default to 0.
        resume_skip = int(meta.get("step_in_epoch", 0) or 0)
        logging.info(
            f"Resumed from {resume_path} at epoch {start_epoch}"
            + (f", step {resume_skip}" if resume_skip else "")
        )

    from gaviko_tpu.train.schedule import onecycle_cos_host

    sch_cfg = train_cfg["scheduler"]
    sched_host = onecycle_cos_host(
        sch_cfg["max_lr"], total_steps, sch_cfg.get("pct_start", 0.3),
        sch_cfg.get("div_factor", 25.0), sch_cfg.get("final_div_factor", 1e4),
    )

    def _base_row():
        return {
            "train_epoch_acc": train_acc, "train_epoch_loss": train_loss,
            "val_epoch_acc": val_acc, "val_epoch_loss": val_loss,
            "best_epoch": best_epoch, "best_val_acc": val_acc_max,
            "time_stamp": time_stamp, "epoch": current_epoch,
        }

    # Optional wandb (ref: train.py:354-361, 434-441, 452-459). Gated: wandb
    # is not installed in this environment; train.py only enables the flag
    # when the import succeeded.
    wandb_on = config.get("wandb", {}).get("enable", False)

    def _wandb_log(payload, step):
        if wandb_on:
            import wandb

            wandb.log(payload, step=step)

    def _save_resume(epoch_done: int, step_in_epoch: int = 0):
        """Full train state (params+opt+progress). ``step_in_epoch`` > 0
        marks a mid-epoch preemption state; 0 is an epoch boundary."""
        if not train_cfg.get("save_resume_state", True):
            return None
        from gaviko_tpu.utils.checkpoint import (
            save_train_state,
            save_train_state_orbax,
            tree_to_host,
        )

        # Multi-host: the gather below is COLLECTIVE (ZeRO moments span
        # processes), so every process runs it; only process 0 writes.
        host_trainable = tree_to_host(dict(trainable))
        host_opt = tree_to_host(opt_state)
        if jax.process_index() != 0:
            return None
        os.makedirs(resume_dir, exist_ok=True)
        saver = save_train_state_orbax if ckpt_backend == "orbax" else save_train_state
        path = os.path.join(resume_dir, resume_name)
        saver(
            path,
            host_trainable,
            host_opt,
            meta={
                "epoch": epoch_done,
                "step_in_epoch": step_in_epoch,
                "global_step": global_step,
                "best_val_acc": val_acc_max,
                "best_epoch": best_epoch,
                "epoch_since_improvement": epoch_since_improvement,
            },
        )
        return path

    preempted = False
    # Epoch-boundary resume saves gather the FULL train state (params + Adam
    # moments — ~530 MB for vit-b16 fft) to host. Rate-limit them by wall
    # time (train.resume_save_interval_s, default 600; 0 = every epoch):
    # durability stays bounded at one interval, while fast epochs stop
    # paying a device->host gather each (through the axon relay's
    # ~10-16 MB/s wire that gather dominated the epoch: measured 75 s/epoch
    # vs 15 s without it). The final epoch, early stopping, and preemption
    # ALWAYS save — those states are the resume contract.
    resume_interval = float(train_cfg.get("resume_save_interval_s", 600.0))
    # -inf seed: the FIRST epoch boundary always saves, so a hard kill/crash
    # (no SIGTERM) never loses more than one epoch even when the interval
    # rate-limiter would otherwise skip early boundaries.
    last_resume_save = float("-inf")
    for epoch in range(start_epoch, num_epochs):
        t_epoch = time.time()
        # Resume-exact data order: shuffle/augment RNG follows the TRUE epoch
        # number (Loader.set_epoch), so a resumed run replays the stream the
        # uninterrupted run would have produced.
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        skip = resume_skip if epoch == start_epoch else 0
        if skip and hasattr(train_loader, "skip_batches"):
            train_loader.skip_batches(min(skip, len(train_loader)))
            logging.info(
                f"Mid-epoch resume: skipping {skip} already-trained batches "
                f"of epoch {epoch}"
            )
        elif skip:
            skip = 0  # loader can't fast-forward; re-run the epoch fully
        # Metric scalars stay on device during the hot loop; the only
        # per-step host work is dispatch, so H2D/compute pipeline freely
        # (per-step float() syncs would stall ~25 ms each on this relay).
        step_stats = []  # (loss_dev, correct_dev, batch_size)
        # Batches arrive already staged on device: multi-host global-batch
        # assembly + the row-major pinned put_volume transfer ran on the
        # prefetch thread (or inline when h2d_prefetch is off).
        for index, (inputs, labels, n_valid) in enumerate(
            _iter_staged(train_loader), start=skip
        ):
            memory_logger.index = index
            memory_logger.display_before_forward_pass()
            if global_step == prof_start:
                jax.profiler.start_trace(prof_dir)
                logging.info(f"Profiler trace started -> {prof_dir}")
            step_rng = jax.random.fold_in(rng, global_step)
            memory_logger.display_after_moving_data_to_gpu()
            if not batch_bytes_set:
                memory_logger.set_sizes(batch_bytes=int(inputs.nbytes))
                batch_bytes_set = True
            trainable, opt_state, loss, correct = train_step(
                trainable, opt_state, frozen, inputs, labels, step_rng
            )
            # forward/backward/update are one fused XLA computation; these
            # hooks sample post-step stats (see MemoryUsageLogger docstring)
            # and `peak` carries the intra-step activation high-water mark.
            memory_logger.display_after_forward_pass()
            memory_logger.display_after_backward_pass()
            memory_logger.display_after_optimization_step()
            global_step += 1
            # n_valid (not inputs.shape[0]): with pad_to_batch the final
            # batch carries ignore_index pad rows that the loss skipped.
            step_stats.append((loss, correct, n_valid))
            if prof_start >= 0 and global_step == prof_start + prof_steps:
                jax.tree.leaves(trainable)[0].block_until_ready()
                jax.profiler.stop_trace()
                logging.info("Profiler trace stopped")
            if guard.preempted:
                break
        if guard.preempted:
            # Mid-epoch preemption: the in-flight step finished; save state
            # pointing at the next unconsumed batch. (This partial epoch's
            # CSV rows are dropped — progress state, not logs, is the
            # recovery contract.)
            path = _save_resume(epoch, skip + len(step_stats))
            logging.info(
                "Preempted at epoch %d step %d — resume state saved to %s",
                epoch, skip + len(step_stats), path,
            )
            preempted = True
            break
        losses, corrects = _gather_stats(step_stats)
        current_lr = sched_host(max(global_step - 1, 0))
        num_acc = 0.0
        running_loss = 0.0
        for index, ((loss_v, correct_v), (_, _, bs)) in enumerate(
            zip(zip(losses, corrects), step_stats), start=skip
        ):
            running_loss += loss_v * bs
            num_acc += correct_v
            # Reference per-step normalization quirk (train.py:329-330).
            train_step_acc = num_acc / (train_len * (epoch + 1))
            train_step_loss = running_loss / (train_len * (epoch + 1))
            train_step_n = epoch * len(train_loader) + index + 1
            csv_logger.log({
                **_base_row(),
                "train_step_acc": train_step_acc,
                "train_step_loss": train_step_loss,
                "val_step_acc": val_step_acc,
                "val_step_loss": val_step_loss,
                "lr": sched_host(epoch * len(train_loader) + index),
                "train_step": train_step_n,
                "val_step": val_step_n,
            })
            _wandb_log({
                "train_step_acc": train_step_acc,
                "train_step_loss": train_step_loss,
                "lr": sched_host(epoch * len(train_loader) + index),
                "epoch": current_epoch,
                "train_step": train_step_n,
            }, step=train_step_n)
        train_loss = running_loss / max(len(train_loader), 1)
        train_acc = num_acc / max(train_len, 1)
        logging.info(
            f"Epoch {epoch}: lr={current_lr:.6f} "
            f"({time.time() - t_epoch:.1f}s)"
        )

        # ---- validation ----
        val_stats = []
        # Same staged pipeline as the train loop (multi-host global-batch
        # assembly + pinned transfer on the prefetch thread).
        for index_val, (inputs, labels, n_valid) in enumerate(
            _iter_staged(val_loader)
        ):
            loss, correct, _ = eval_step(trainable, frozen, inputs, labels)
            if index_val == 0 and train_cfg.get("flops_calculation") and not flops_done:
                flops = jit_cost_flops(
                    lambda p, x: model.apply(p, x, model.spec), {**frozen, **trainable}, inputs
                )
                n_total = sum(int(np.prod(v.shape)) for v in {**frozen, **trainable}.values())
                analyze_model_computation(n_total, flops, verbose=True)
                flops_done = True
            val_stats.append((loss, correct, n_valid))
        val_losses, val_corrects = _gather_stats(val_stats)
        num_val_acc = 0.0
        running_val_loss = 0.0
        for index_val, ((loss_v, correct_v), (_, _, bs)) in enumerate(
            zip(zip(val_losses, val_corrects), val_stats)
        ):
            running_val_loss += loss_v * bs
            num_val_acc += correct_v
            val_step_acc = num_val_acc / (val_len * (epoch + 1))
            val_step_loss = running_val_loss / (val_len * (epoch + 1))
            val_step_n = epoch * len(val_loader) + index_val + 1
            csv_logger.log({
                **_base_row(),
                "train_step_acc": train_step_acc,
                "train_step_loss": train_step_loss,
                "val_step_acc": val_step_acc,
                "val_step_loss": val_step_loss,
                "lr": current_lr,
                "train_step": train_step_n,
                "val_step": val_step_n,
            })
            _wandb_log({
                "val_step_acc": val_step_acc,
                "val_step_loss": val_step_loss,
                "epoch": current_epoch,
                "val_step": val_step_n,
            }, step=train_step_n)
        val_loss = running_val_loss / max(len(val_loader), 1)
        val_acc = num_val_acc / max(val_len, 1)
        _wandb_log({
            "train_epoch_loss": train_loss,
            "train_epoch_acc": train_acc,
            "val_epoch_loss": val_loss,
            "val_epoch_acc": val_acc,
            "best_val_acc": val_acc_max,
        }, step=train_step_n)

        current_epoch += 1
        if val_acc > val_acc_max:
            logging.info(
                f"Validation accuracy increased ({val_acc_max:.6f} --> {val_acc:.6f})."
            )
            val_acc_max = val_acc
            best_epoch = current_epoch
            if val_acc_max > train_cfg["save_threshold"]:
                method = config["model"]["method"]
                save_dir = os.path.join(train_cfg["save_dir"], "experiments", method)
                backbone = config["model"]["backbone"].replace("-", "_")
                best_ckpt_path = os.path.join(
                    save_dir,
                    f"{method}_{backbone}_best_model_epoch{current_epoch}_acc{val_acc:.4f}.pt",
                )
                # Params are replicated on every process (only optimizer
                # moments are ZeRO-sharded), so this fetch is local; the
                # process-0 gate just prevents N hosts clobbering one file
                # on a shared filesystem.
                from gaviko_tpu.utils.checkpoint import tree_to_host

                state = tree_to_host({**frozen, **trainable})
                if jax.process_index() == 0:
                    os.makedirs(save_dir, exist_ok=True)
                    payload = filter_state(state, trainable.keys())
                    from gaviko_tpu.weights.torch_io import save_pt

                    save_pt(best_ckpt_path, payload)
                    logging.info(f"Model saved to {best_ckpt_path}")
            epoch_since_improvement = 0
        else:
            epoch_since_improvement += 1
            logging.info(f"There's no improvement for {epoch_since_improvement} epochs.")
            if epoch_since_improvement >= patience:
                logging.info("The training halted by early stopping criterion.")
                # Persist THIS epoch's boundary state before leaving: the
                # loop's end-of-body _save_resume is skipped by the break,
                # and a later rerun with a higher patience/num_epochs would
                # otherwise replay an already-completed epoch.
                _save_resume(current_epoch)
                break
        logging.info(
            f"Epoch {epoch + 1}: loss {train_loss:.4f} acc {train_acc*100:.2f}% | "
            f"val loss {val_loss:.4f} val acc {val_acc*100:.2f}%"
        )

        if (epoch == num_epochs - 1 or resume_interval <= 0
                or guard.preempted  # the break below must leave fresh state
                or time.monotonic() - last_resume_save >= resume_interval):
            _save_resume(current_epoch)
            last_resume_save = time.monotonic()
        if guard.preempted:
            # Signal arrived during validation/bookkeeping: the epoch is
            # complete and its boundary state is saved; stop before the next.
            logging.info("Preempted at the epoch %d boundary.", epoch)
            preempted = True
            break

    if preempted:
        logging.info(
            "Training preempted — rerun with `--resume auto` to continue."
        )
    else:
        logging.info("Training completed.")
    return {
        "best_val_acc": val_acc_max,
        "best_epoch": best_epoch,
        "best_ckpt_path": best_ckpt_path,
        "params": {**frozen, **trainable},
        "csv_log": csv_logger.get_file_path(),
        "preempted": preempted,
    }
