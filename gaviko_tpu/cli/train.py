"""Training entry point — same public contract as the reference's src/train.py:

    python train.py --config <yaml> --method <m> --results_dir <dir>

Config groups utils/data/model/train/wandb; per-step CSV logging with the
reference's 15 fields; trainable-only best checkpoints; early stopping.
wandb is optional and gated on config['wandb']['enable'] (absent in this
environment -> warn and continue).
"""

from __future__ import annotations

import argparse
import logging

import jax
import numpy as np
import pandas as pd

from gaviko_tpu.config import METHODS, apply_method_override, load_config
from gaviko_tpu.data import transforms as T
from gaviko_tpu.data.pipeline import Loader, dataset_from_dataframe, split_dataframe
from gaviko_tpu.models.factory import build_model
from gaviko_tpu.models.pretrained import build_params
from gaviko_tpu.train.loop import run_training
from gaviko_tpu.utils.logging import setup_logging
from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: repeat runs skip the relay compile


def make_loaders(config: dict):
    """CSV split -> train/val loaders (ref: train.py:33-78)."""
    # Multi-host DP: each process loads only its slice of every global batch
    # (process_count == 1 in single-host runs, making shard a no-op).
    shard = (jax.process_index(), jax.process_count())
    df = pd.read_csv(config["data"]["data_path"])
    image_folder = config["data"].get("image_folder")
    train_df = split_dataframe(df, "train")
    val_df = split_dataframe(df, "val")
    import functools

    if config["train"].get("device_augment"):
        # Raw volumes to the device; augmentation + rescale run inside the
        # jitted step (gaviko_tpu/ops/augment.py) — essential on weak hosts.
        def raw_train(x, rng):
            return np.ascontiguousarray(x, dtype=np.float32)

        def raw_eval(x):
            return np.ascontiguousarray(x, dtype=np.float32)

        train_tf, val_tf = raw_train, raw_eval
    else:
        train_tf = functools.partial(
            T.train_transform,
            intensity_augs=config["data"].get("intensity_augs", False),
        )
        val_tf = T.eval_transform
    train_ds = dataset_from_dataframe(train_df, train_tf, True, image_folder)
    val_ds = dataset_from_dataframe(val_df, val_tf, False, image_folder)
    bs = config["data"]["batch_size"]
    nw = config["data"].get("num_workers", 8)
    # pad_to_batch keeps every batch the same static shape: a non-divisible
    # dataset otherwise yields one differently-shaped batch per epoch, which
    # costs an extra XLA compile (minutes through the relay) and breaks
    # in_shardings=P('data') dispatch when train.parallel is enabled. Padded
    # rows carry ignore_index=-100 labels; losses/accuracy skip them.
    from gaviko_tpu.data.pipeline import pick_loader

    loader_cls = pick_loader(config)  # native threads | grain runtime
    # train.seed drives the data stream too (shuffle order + host-side
    # augmentation draws), not just the jax param/dropout key — otherwise
    # every seed sees bit-identical batches and seed-ensemble variance is
    # understated.
    seed = int(config.get("train", {}).get("seed", 0))
    train_loader = loader_cls(train_ds, bs, shuffle=True, num_workers=nw,
                              seed=seed, pad_to_batch=True, shard=shard)
    val_loader = loader_cls(val_ds, bs, shuffle=False, num_workers=nw,
                            seed=seed, pad_to_batch=True, shard=shard)
    return train_loader, val_loader, len(train_ds), len(val_ds)


def train(config: dict) -> dict:
    time_stamp = pd.Timestamp.now().strftime("%Y%m%d_%H%M%S")
    if config.get("wandb", {}).get("enable"):
        try:
            import wandb

            wandb.init(
                project=config["wandb"]["project"],
                config=config,
                name=config["wandb"].get("name", f"run_{time_stamp}"),
                dir=config["utils"]["log_dir"],
                save_code=True,
            )
        except ImportError:
            logging.warning("wandb not installed; continuing without it.")
            config["wandb"]["enable"] = False
    from gaviko_tpu.parallel.mesh import maybe_init_multihost

    pi, pc = maybe_init_multihost(config["train"].get("parallel") or {})
    if pc > 1:
        logging.info(f"Multi-host: process {pi}/{pc}")
    logging.info(f"Devices: {jax.devices()}")
    logging.info(f"Phase: {config['utils'].get('phase')}")

    loaders = make_loaders(config)
    model = build_model(config["model"])
    params = build_params(
        model,
        jax.random.PRNGKey(config["train"].get("seed", 0)),
        pretrained_dir=config["model"].get("pretrained_dir", "./pretrained"),
    )
    result = run_training(config, model, params, loaders, time_stamp)
    if config.get("wandb", {}).get("enable"):
        import wandb

        wandb.finish()
    return result


def main():
    parser = argparse.ArgumentParser(description="Training script for Gaviko model")
    parser.add_argument("--config", type=str, default="gaviko_tpu/configs/gaviko.yaml",
                        help="Path to the configuration file")
    parser.add_argument("--method", type=str, default="gaviko", choices=list(METHODS),
                        help="Model to train")
    parser.add_argument("--results_dir", type=str, default=None,
                        help="Directory to save results")
    parser.add_argument("--resume", type=str, default=None,
                        help="Path to a resume_state.npz, or 'auto' to pick up "
                             "the latest state in save_dir")
    args = parser.parse_args()

    config = load_config(args.config)
    apply_method_override(config, args.method)
    if args.results_dir is not None:
        config["train"]["save_dir"] = args.results_dir
    if args.resume is not None:
        config["train"]["resume"] = args.resume
    setup_logging(log_dir=config["utils"]["log_dir"])
    logging.info(f"Config: {config}")
    result = train(config)
    if result.get("preempted"):
        # SIGTERM/SIGINT landed mid-run; state is saved (train/preemption.py).
        logging.info(
            "Preempted cleanly. Continue with: %s --config %s --method %s "
            "--resume auto", parser.prog, args.config, args.method,
        )


if __name__ == "__main__":
    main()
