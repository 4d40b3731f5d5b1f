"""Folder inference entry point — same contract as the reference's src/inference.py:

    python inference.py --config <yaml> --method <m> --checkpoint <ckpt> --results_dir <dir>

Scans ``data.image_folder`` for ``*.npz``, predicts argmax classes, writes
the versioned ``{method}_{backbone}_inference_results_v{N}.csv``.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from gaviko_tpu.config import METHODS, apply_method_override, load_config
from gaviko_tpu.utils.layouts import put_volume
from gaviko_tpu.data import transforms as T
from gaviko_tpu.data.pipeline import dataset_from_dataframe, scan_folder
from gaviko_tpu.models.factory import build_model
from gaviko_tpu.models.pretrained import build_params
from gaviko_tpu.train.loop import make_steps, split_params
from gaviko_tpu.train.losses import cross_entropy_loss
from gaviko_tpu.utils.logging import setup_logging
from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: repeat runs skip the relay compile

from gaviko_tpu.cli.evaluate import versioned_path


def inference(config: dict) -> str:
    logging.info(f"Devices: {jax.devices()}")
    test_df = scan_folder(config["data"]["image_folder"])
    ds = dataset_from_dataframe(test_df, T.eval_transform, False)
    # pad_to_batch avoids recompiling the predict graph for the ragged final
    # batch; pad-row predictions are sliced off below via n_valid.
    from gaviko_tpu.data.pipeline import pick_loader

    loader = pick_loader(config)(
        ds, config["data"]["batch_size"], shuffle=False,
        num_workers=config["data"].get("num_workers", 8),
        pad_to_batch=True)

    model = build_model(config["model"])
    ckpt = config["utils"].get("checkpoint")
    if ckpt and not os.path.exists(ckpt):
        raise FileNotFoundError(
            f"Model weights not found at {ckpt}. Please check the path."
        )
    params = build_params(
        model, jax.random.PRNGKey(0),
        pretrained_dir=config["model"].get("pretrained_dir", "./pretrained"),
        checkpoint_path=ckpt,
    )
    trainable, frozen = split_params(model, params)
    import optax

    _, _, predict_step = make_steps(model, cross_entropy_loss, optax.identity())

    all_outputs = []
    for inputs, _, n_valid in loader:
        logits = np.asarray(predict_step(trainable, frozen, put_volume(inputs)))
        all_outputs.append(np.argmax(logits[:n_valid], axis=1))
    all_outputs = np.concatenate(all_outputs, axis=0) if all_outputs else np.zeros(0, int)
    logging.info(f"Final outputs shape: {all_outputs.shape}")

    test_df["outputs"] = all_outputs.tolist()
    test_df["mri_path"] = test_df["mri_path"].apply(os.path.basename)
    out_df = test_df[["mri_path", "outputs"]]

    results_dir = config["utils"]["results_dir"]
    os.makedirs(results_dir, exist_ok=True)
    backbone = config["model"]["backbone"].replace("-", "_")
    csv_path = versioned_path(
        results_dir,
        f"{config['model']['method']}_{backbone}_inference_results_v{{version}}.csv",
    )
    out_df.to_csv(csv_path, index=False)
    logging.info(f"Results saved to {csv_path}")
    return csv_path


def inference_artifact(artifact: str, image_folder: str,
                       results_dir: str) -> str:
    """Folder inference from a deployment artifact (no model build/config).

    Same outputs as :func:`inference` — versioned
    ``{method}_{backbone}_inference_results_v{N}.csv`` with argmax classes —
    but the forward comes from the serialized ``gaviko-export`` zip."""
    from gaviko_tpu.deploy import DeployedPredictor

    pred = DeployedPredictor(artifact)
    test_df = scan_folder(image_folder)
    outputs = []
    # Stream in predictor-sized chunks: volumes are ~12M floats each, so
    # loading the whole folder before predicting would not scale.
    paths = list(test_df["mri_path"])
    for i in range(0, len(paths), pred.batch_size):
        vols = [np.load(p)["data"] for p in paths[i: i + pred.batch_size]]
        outputs.extend(int(c) for c in pred.predict(vols))
    test_df["outputs"] = outputs
    test_df["mri_path"] = test_df["mri_path"].apply(os.path.basename)
    out_df = test_df[["mri_path", "outputs"]]

    os.makedirs(results_dir, exist_ok=True)
    mc = pred.meta["model_config"]
    backbone = str(mc.get("backbone", "none")).replace("-", "_")
    csv_path = versioned_path(
        results_dir,
        f"{mc['method']}_{backbone}_inference_results_v{{version}}.csv",
    )
    out_df.to_csv(csv_path, index=False)
    logging.info(f"Results saved to {csv_path}")
    return csv_path


def main():
    parser = argparse.ArgumentParser(description="Inference script for Gaviko model")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--artifact", type=str, default=None,
                        help="run from a deployment artifact (gaviko-export "
                             "output) instead of building from --config; "
                             "requires --image_folder")
    parser.add_argument("--image_folder", type=str, default=None,
                        help="npz folder to scan (with --artifact; --config "
                             "runs take it from data.image_folder)")
    parser.add_argument("--results_dir", type=str, default="./outputs")
    parser.add_argument("--checkpoint", type=str, required=False)
    parser.add_argument("--method", type=str, default="gaviko", choices=list(METHODS))
    args = parser.parse_args()

    if (args.config is None) == (args.artifact is None):
        parser.error("exactly one of --config or --artifact is required")
    if args.artifact is not None:
        if args.image_folder is None:
            parser.error("--artifact requires --image_folder")
        if args.checkpoint is not None:
            parser.error("--checkpoint is baked into the artifact at export "
                         "time; not accepted with --artifact")
        os.makedirs(args.results_dir, exist_ok=True)
        setup_logging(log_dir=args.results_dir)
        inference_artifact(args.artifact, args.image_folder, args.results_dir)
        return

    config = load_config(args.config)
    apply_method_override(config, args.method)
    config["utils"]["results_dir"] = args.results_dir or config["utils"].get("results_dir")
    config["utils"]["checkpoint"] = args.checkpoint
    os.makedirs(config["utils"]["results_dir"], exist_ok=True)
    setup_logging(log_dir=config["utils"]["results_dir"])
    logging.info(f"Config: {config}")
    inference(config)


if __name__ == "__main__":
    main()
