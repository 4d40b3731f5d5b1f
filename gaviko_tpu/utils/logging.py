"""Observability: versioned CSV step logs, python logging, FLOPs/memory reports.

Mirrors the reference surface (src/utils/logging.py): CSVLogger with
versioned ``{prefix}_v{N}.csv`` filenames and a fixed field list;
``setup_logging`` to timestamped file + console; ``analyze_model_computation``
param/FLOP/memory summary. The CUDA memory snapshot logger becomes a TPU
device-memory logger backed by ``device.memory_stats()`` with the same
five hook points on the first step.
"""

from __future__ import annotations

import csv
import logging
import os
from datetime import datetime
from typing import Dict, Iterable, Optional


class CSVLogger:
    """Versioned per-step CSV logger (ref: logging.py:9-54)."""

    def __init__(self, log_dir: str, filename_prefix: str = "train_log",
                 fields: Iterable[str] = ("epoch", "loss", "acc", "lr")):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        version = 1
        while True:
            filename = f"{filename_prefix}_v{version}.csv"
            self.filename = os.path.join(log_dir, filename)
            if not os.path.exists(self.filename):
                break
            version += 1
        self.fields = list(fields)
        with open(self.filename, "w", newline="") as f:
            csv.DictWriter(f, fieldnames=self.fields).writeheader()

    def log(self, data: Dict) -> None:
        with open(self.filename, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self.fields).writerow(data)

    def get_file_path(self) -> str:
        return self.filename


TRAIN_LOG_FIELDS = [
    "epoch", "train_step_acc", "train_step_loss", "train_epoch_loss",
    "val_step_acc", "val_step_loss", "val_epoch_loss", "lr",
    "best_epoch", "best_val_acc", "time_stamp", "train_step", "val_step",
    "train_epoch_acc", "val_epoch_acc",
]  # ref: train.py:85-88


def setup_logging(log_level=logging.INFO, log_dir: str = "./log") -> None:
    os.makedirs(log_dir, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join(log_dir, f"{timestamp}.log")
    logging.basicConfig(
        level=log_level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=[logging.FileHandler(log_file, encoding="utf-8"),
                  logging.StreamHandler()],
        force=True,
    )
    logging.info(f"Logging initialized. Log file: {log_file}")


def analyze_model_computation(parameters: int, flops: Optional[int], verbose=True) -> dict:
    """Param-count memory + FLOP summary (ref: logging.py:77-141)."""
    memory_fp32_mb = parameters * 4 / (1024 * 1024)
    results = {
        "parameters": parameters,
        "parameters_millions": round(parameters / 1e6, 2),
        "memory_mb": {
            "fp32": round(memory_fp32_mb, 1),
            "fp16": round(parameters * 2 / (1024 * 1024), 1),
            "int8": round(parameters / (1024 * 1024), 1),
        },
        "training_memory_gb": round(memory_fp32_mb * 3 / 1024, 1),
    }
    if flops is not None:
        results.update({
            "flops": flops,
            "gflops": round(flops / 1e9, 2),
            "tflops": round(flops / 1e12, 3),
        })
    if verbose:
        logging.info(f"MODEL ANALYSIS: {results}")
    return results


def jit_cost_flops(fn, *args) -> Optional[int]:
    """Forward-pass FLOPs from XLA's cost analysis — the TPU-native
    equivalent of torchprofile.profile_macs (ref: train.py:246-252)."""
    try:
        import jax

        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            return int(cost["flops"])
    except Exception:  # pragma: no cover - cost analysis is best-effort
        return None
    return None


class MemoryUsageLogger:
    """Device-memory snapshots at the reference's five hook points of step 0
    (ref: logging.py:146-340), backed by TPU memory_stats.

    Reference-fidelity note: the reference separates after-forward and
    after-backward because eager torch executes them as distinct host calls
    (ref: logging.py:289-340). Here forward+backward+update are ONE fused
    XLA computation, so those two hooks sample the same post-step state; the
    true intra-step high-water mark (activations + grads) is visible in the
    ``peak`` field. model_size/data_size mirror the reference's fields.
    """

    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.index = 0
        self.model_bytes: Optional[int] = None
        self.batch_bytes: Optional[int] = None

    def set_sizes(self, model_bytes: Optional[int] = None,
                  batch_bytes: Optional[int] = None) -> None:
        if model_bytes is not None:
            self.model_bytes = model_bytes
        if batch_bytes is not None:
            self.batch_bytes = batch_bytes

    def _snapshot(self, tag: str) -> None:
        if not self.verbose or self.index != 0:
            return
        sizes = ""
        if self.model_bytes is not None:
            sizes += f" model_size={self.model_bytes / 2**20:.1f}MiB"
        if self.batch_bytes is not None:
            sizes += f" data_size={self.batch_bytes / 2**20:.1f}MiB"
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            used = stats.get("bytes_in_use", 0) / 2**20
            peak = stats.get("peak_bytes_in_use", 0) / 2**20
            limit = stats.get("bytes_limit", 0) / 2**20
            logging.info(
                f"[memory:{tag}] in_use={used:.1f}MiB peak={peak:.1f}MiB "
                f"limit={limit:.1f}MiB{sizes}"
            )
        except Exception:
            logging.info(f"[memory:{tag}] memory_stats unavailable{sizes}")

    def display_before_forward_pass(self, **_):
        self._snapshot("before_forward")

    def display_after_moving_data_to_gpu(self, **_):
        self._snapshot("after_h2d")

    def display_after_forward_pass(self, **_):
        self._snapshot("after_forward")

    def display_after_backward_pass(self, **_):
        self._snapshot("after_backward")

    def display_after_optimization_step(self, **_):
        self._snapshot("after_step")
