"""One process of the multi-host CPU validation run (scripts/multihost_dryrun.py).

Runs the REAL training entry path (train.train -> cli/train.py make_loaders ->
train/loop.py) under ``jax.distributed`` with N processes x 4 virtual CPU
devices each, so the code that was previously only unit-tested executes end
to end: ``maybe_init_multihost`` (explicit topology), per-host batch slicing
in the Loader, ``make_global_batch_fn``'s
``jax.make_array_from_process_local_data`` branch, the sharded train/eval
steps over a mesh spanning processes, and the collective ``tree_to_host``
gather feeding process-0-only checkpoint writes.

Reference analog: the DeepSpeed multi-process branch the reference defines
but never exercises (ref: src/train.py:232-243).

Launched by the driver with XLA_FLAGS=--xla_force_host_platform_device_count=4
in the env. Emits a JSON result file with per-step losses parsed from the
run's own CSV log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(root: str, proc_root: str, args) -> dict:
    """Tiny full-pipeline config over the shared dataset at ``root``.

    Deterministic across topologies: dropout 0, fixed seed, host-side
    augmentation RNG keyed by GLOBAL dataset index (data/pipeline.py).
    """
    model_ax = int(getattr(args, "model_axis", 1) or 1)
    parallel = {"enabled": True, "data": 8 // model_ax, "model": model_ax,
                "zero": True}
    if args.num_processes > 1:
        parallel.update(
            multihost=True,
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    return {
        "utils": {"log_dir": os.path.join(proc_root, "log"), "phase": "train",
                  "results_dir": os.path.join(proc_root, "outputs"),
                  "checkpoint": None},
        "data": {"batch_size": 8, "num_workers": 2,
                 "data_path": os.path.join(root, "labels.csv"),
                 "image_folder": os.path.join(root, "volumes"),
                 "test_data": os.path.join(root, "labels.csv")},
        "model": {"image_size": 32, "image_patch_size": 16, "frames": 24,
                  "frame_patch_size": 12, "dropout": 0.0, "emb_dropout": 0.0,
                  "channels": 1, "num_classes": 5, "pool": "cls",
                  "backbone": "vit-t16", "method": "bitfit", "fp16": False},
        "train": {"num_epochs": 2, "lr": 1e-4, "weight_decay": 1e-4,
                  "warmup_steps": 10, "loss_fn": "focal_loss",
                  "optimizer": "adam", "accumulation_steps": 1,
                  "save_dir": os.path.join(proc_root, "weights"),
                  "save_threshold": 0.0, "seed": 0,
                  "resume_save_interval_s": 0.0,  # save every boundary
                  "parallel": parallel,
                  "scheduler": {"max_lr": 3e-3, "pct_start": 0.3,
                                "div_factor": 10.0,
                                "final_div_factor": 1000.0,
                                "anneal_strategy": "cos",
                                "three_phase": False},
                  "patience": 15, "memory_verbose": False,
                  "flops_calculation": False},
        "wandb": {"enable": False, "project": "t", "name": "t",
                  "log_model": False, "save_code": False,
                  "dir": os.path.join(proc_root, "log")},
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--port", type=str, default="0")
    p.add_argument("--root", required=True, help="shared dataset root")
    p.add_argument("--out", required=True, help="result JSON path")
    p.add_argument("--model-axis", type=int, default=1,
                   help="TP width (data axis = 8 // model)")
    p.add_argument("--tag", type=str, default="",
                   help="run-dir prefix so phases sharing a dataset root "
                        "do not collide")
    args = p.parse_args()

    import jax

    # This environment's sitecustomize force-registers the axon TPU plugin
    # and overrides JAX_PLATFORMS; the config update AFTER import is the
    # supported way to pin CPU (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    proc_root = os.path.join(args.root, args.tag + (
        f"proc{args.process_id}" if args.num_processes > 1 else "single"))
    os.makedirs(proc_root, exist_ok=True)
    result = {"process_id": args.process_id,
              "num_processes": args.num_processes}
    try:
        from gaviko_tpu.utils.logging import setup_logging

        setup_logging(log_dir=os.path.join(proc_root, "log"))
        config = build_config(args.root, proc_root, args)

        import train as train_mod

        out = train_mod.train(config)

        # The silent-fallback failure mode this run exists to catch: if
        # distributed init degraded to single-process, each process trained
        # on a 1/N data shard and every downstream number is garbage.
        if jax.process_count() != args.num_processes:
            raise RuntimeError(
                f"process_count {jax.process_count()} != requested "
                f"{args.num_processes}"
            )

        import csv as csv_lib

        train_losses, val_losses, val_accs = [], [], []
        if out.get("csv_log") and os.path.exists(out["csv_log"]):
            with open(out["csv_log"]) as f:
                for row in csv_lib.DictReader(f):
                    train_losses.append(float(row["train_step_loss"]))
                    val_losses.append(float(row["val_step_loss"]))
                    val_accs.append(float(row["val_step_acc"]))
        resume = os.path.join(config["train"]["save_dir"], "experiments",
                              "bitfit", "resume_state.npz")
        best = out.get("best_ckpt_path")
        if best and not os.path.exists(best):
            best = None  # path computed on every process; file = writer only
        result.update(
            ok=True,
            process_count_seen=jax.process_count(),
            device_count=jax.device_count(),
            local_device_count=jax.local_device_count(),
            train_step_losses=train_losses,
            val_step_losses=val_losses,
            val_step_accs=val_accs,
            best_val_acc=float(out["best_val_acc"]),
            best_ckpt_path=best,
            resume_state_path=resume if os.path.exists(resume) else None,
        )
    except Exception as e:  # noqa: BLE001 - reported via the JSON contract
        result.update(ok=False, error=f"{type(e).__name__}: {e}",
                      traceback=traceback.format_exc())
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0 if result.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
