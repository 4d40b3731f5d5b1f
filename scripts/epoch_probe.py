"""Real-epoch wall-time probe: does epoch time track step time?

Builds a full-geometry synthetic dataset (24 train + 8 val volumes of
(120,160,160) float32 npz), runs 3 epochs of vit-b16 fft training through
the REAL entry path (train.train) with `train.device_augment: true` and
bf16 compute, and reports per-epoch wall time vs the step budget
(steps x [train step + device augmentation]). Epoch 1 pays the jit
compiles; epochs 2+ are the steady state this probe is about.

Host context matters for reading the numbers: this machine has ONE CPU
core, so the raw-volume load path (np.load + ascontiguousarray; host
transforms are OFF under device_augment) is the loader's entire cost and
cannot overlap itself. Production hosts with real core counts (and
`data.loader: grain` + `grain_processes`) scale that part linearly.

Run:  python scripts/epoch_probe.py [n_train] [epochs]

With ``--record``, additionally writes the machine-readable summary to
``EPOCH_PROBE.json`` at the repo root — the committed per-round artifact
proving real-epoch training tracks the benched step time (round-3
verdict #8). Ref workload: src/train.py:65-78, 257-361.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def make_dataset(root, n_train, n_val, shape=(120, 160, 160)):
    import pandas as pd

    volumes = os.path.join(root, "volumes")
    os.makedirs(volumes, exist_ok=True)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(n_train + n_val):
        name = f"vol_{i:03d}.npz"
        np.savez(os.path.join(volumes, name),
                 data=rng.rand(*shape).astype(np.float32))
        rows.append({"mri_path": name, "kl_grade": i % 5,
                     "subset": "train" if i < n_train else "val"})
    csv_path = os.path.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path, volumes


def main():
    record = "--record" in sys.argv
    argv = [a for a in sys.argv if a != "--record"]
    n_train = int(argv[1]) if len(argv) > 1 else 24
    epochs = int(argv[2]) if len(argv) > 2 else 3
    n_val = 8
    root = tempfile.mkdtemp(prefix="epoch_probe_")
    t0 = time.time()
    csv_path, volumes = make_dataset(root, n_train, n_val)
    print(f"dataset: {n_train}+{n_val} full-geometry volumes "
          f"({time.time() - t0:.1f}s to write)")

    import train as train_mod

    config = {
        "utils": {"log_dir": os.path.join(root, "log"), "phase": "train",
                  "results_dir": os.path.join(root, "outputs"),
                  "checkpoint": None},
        "data": {"batch_size": 8, "num_workers": 4, "data_path": csv_path,
                 "image_folder": volumes, "test_data": csv_path},
        "model": {"image_size": 160, "image_patch_size": 16, "frames": 120,
                  "frame_patch_size": 12, "dropout": 0.1, "emb_dropout": 0.1,
                  "channels": 1, "num_classes": 5, "pool": "cls",
                  "backbone": "vit-b16", "method": "fft", "fp16": False,
                  "gelu": "tanh"},
        "train": {"num_epochs": epochs, "lr": 1e-4, "weight_decay": 1e-4,
                  "warmup_steps": 10, "loss_fn": "focal_loss",
                  "optimizer": "adam", "accumulation_steps": 1,
                  "save_dir": os.path.join(root, "weights"),
                  "save_threshold": 2.0,  # never save: measure epochs only
                  "precision": "bf16", "device_augment": True,
                  "scheduler": {"max_lr": 3e-4, "pct_start": 0.3,
                                "div_factor": 10.0,
                                "final_div_factor": 1000.0,
                                "anneal_strategy": "cos",
                                "three_phase": False},
                  "patience": 100, "memory_verbose": False,
                  "flops_calculation": False},
        "wandb": {"enable": False, "project": "t", "name": "t",
                  "log_model": False, "save_code": False,
                  "dir": os.path.join(root, "log")},
    }

    # train() assumes the CLI's main() configured logging; do it here so the
    # per-epoch INFO lines (and their timestamps) exist to be parsed.
    from gaviko_tpu.utils.logging import setup_logging

    setup_logging(log_dir=os.path.join(root, "log"))

    t_train0 = time.time()
    train_mod.train(config)
    t_train = time.time() - t_train0

    # Per-epoch walls from the run's own log timestamps (train() installs
    # its logging with force=True, so a live handler would be removed):
    # consecutive "Epoch k: loss ... val acc" lines bracket full epochs
    # (train steps + val pass + logging glue).
    import glob
    from datetime import datetime

    log_file = max(glob.glob(os.path.join(root, "log", "*.log")),
                   key=os.path.getmtime)
    marks = []
    with open(log_file) as f:
        for line in f:
            if ": loss " in line and "val acc" in line:
                marks.append(datetime.strptime(
                    line.split(" - ")[0].split(",")[0], "%Y-%m-%d %H:%M:%S"))
    walls = [
        (b - a).total_seconds() for a, b in zip(marks, marks[1:])
    ]
    print(f"train() total: {t_train:.1f}s "
          f"(epoch 0 absorbs the jit compiles)")
    steps = (n_train + 7) // 8
    print(f"\nsteps/epoch: {steps} train + {(n_val + 7) // 8} val")
    for i, w in enumerate(walls):
        print(f"epoch {i + 1}: {w:.2f}s wall")  # epoch 0 paid the compiles
    if walls:
        steady = float(np.min(walls))
        # Step budget from the standing on-chip decomposition:
        # 41.4 ms train step (round-4 whole-K backward) + 8.4 ms device
        # augmentation per batch-8, plus the val forward (~11.4 ms/batch).
        budget = steps * (0.0414 + 0.0084) + ((n_val + 7) // 8) * 0.0114
        # Host->device wire rate for one raw f32 batch-8 (98 MB): through
        # the axon relay this is ~10-16 MB/s and DOMINATES the epoch; on a
        # directly-attached TPU host the same transfer is PCIe-rate
        # (>10 GB/s) and disappears into the budget. Measured here so the
        # recorded ratio is interpretable.
        import jax
        import jax.numpy as jnp

        batch = np.random.RandomState(1).rand(8, 1, 120, 160, 160).astype(
            np.float32)
        sum_f = jax.jit(lambda x: x.sum())
        float(sum_f(jnp.asarray(batch)))  # warm the transfer+compile path
        # The relay wire varies 2-6 s per batch run-to-run; time three
        # uploads and use the median so the committed artifact is stable
        # (advisor r4). min/max are recorded alongside.
        wire_samples = []
        for _ in range(3):
            t0 = time.time()
            float(sum_f(jnp.asarray(batch)))
            wire_samples.append(time.time() - t0)
        wire_s = float(np.median(wire_samples))
        n_batches = steps + (n_val + 7) // 8
        budget_wire = budget + n_batches * wire_s
        print(f"steady epoch: {steady:.2f}s wall vs {budget:.2f}s "
              f"step budget -> {steady / budget:.2f}x "
              f"(loader/glue share {100 * (1 - budget / steady):.0f}%)")
        print(f"wire: {wire_s:.2f}s per raw batch-8 upload "
              f"({98.0 / max(wire_s, 1e-9):.1f} MB/s); wire-inclusive "
              f"budget {budget_wire:.2f}s -> {steady / budget_wire:.2f}x")
        vols = n_train / steady
        print(f"end-to-end training throughput: {vols:.1f} vol/s "
              f"(step-only ceiling {8 / 0.0498:.1f})")
        if record:
            import json

            payload = {
                "workload": "vit-b16 fft B8, bf16, device_augment, "
                            f"{n_train}+{n_val} full-geometry volumes",
                "steady_epoch_wall_s": round(steady, 2),
                "step_budget_s": round(budget, 2),
                "wall_over_budget": round(steady / budget, 2),
                "h2d_wire_s_per_batch8": round(wire_s, 2),
                "h2d_wire_s_samples_minmax": [
                    round(min(wire_samples), 2), round(max(wire_samples), 2)],
                "h2d_wire_mb_per_s": round(98.0 / max(wire_s, 1e-9), 1),
                "wire_inclusive_budget_s": round(budget_wire, 2),
                "wall_over_wire_budget": round(steady / budget_wire, 2),
                "epoch_walls_s": [round(w, 2) for w in walls],
                "end_to_end_vols_per_sec": round(vols, 1),
                "step_only_ceiling_vols_per_sec": round(8 / 0.0498, 1),
                "host_note": "axon-relay environment: host->device uploads "
                             "run at the recorded h2d_wire rate (~10-16 "
                             "MB/s vs PCIe >10 GB/s on a real TPU host), "
                             "so wall_over_wire_budget is the meaningful "
                             "tracking ratio here. train.h2d_prefetch "
                             "(default on) stages the next batch's upload "
                             "on a background thread; a ratio < 1.0 is "
                             "direct proof the relay does NOT serialize "
                             "transfer vs compute/decode (the budget sums "
                             "them serially). Single-core host still "
                             "serializes raw-volume np.load within a "
                             "batch's assembly.",
            }
            out = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "EPOCH_PROBE.json")
            with open(out, "w") as f:
                json.dump(payload, f, indent=1)
            print(f"recorded -> {out}")


if __name__ == "__main__":
    main()
