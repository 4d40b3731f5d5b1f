"""Evaluation entry point — same contract as the reference's src/eval.py:

    python eval.py --config <yaml> --method <m> --checkpoint <ckpt> --results_dir <dir>

Evaluates on the CSV's ``val`` subset, merges the trainable-only checkpoint
over vanilla timm-converted weights, reports accuracy / quadratic Cohen's
kappa / macro-OVR ROC-AUC, and writes the versioned
``{method}_{backbone}_eval_results_v{N}.csv`` + ``_metrics.txt``.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gaviko_tpu.config import METHODS, apply_method_override, load_config
from gaviko_tpu.utils.layouts import put_volume
from gaviko_tpu.data import transforms as T
from gaviko_tpu.data.pipeline import dataset_from_dataframe, split_dataframe
from gaviko_tpu.models.factory import build_model
from gaviko_tpu.models.pretrained import build_params
from gaviko_tpu.train.loop import make_steps, split_params
from gaviko_tpu.train.losses import make_criterion
from gaviko_tpu.train.metrics import (
    accuracy,
    cohen_kappa_quadratic,
    roc_auc_ovr_macro,
)
from gaviko_tpu.utils.logging import setup_logging
from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: repeat runs skip the relay compile


def versioned_path(results_dir: str, base: str) -> str:
    version = 1
    while True:
        name = base.format(version=version)
        path = os.path.join(results_dir, name)
        if not os.path.exists(path):
            return path
        version += 1


def _finish_eval(valid_df, y_test, y_pred, y_proba, results_dir: str,
                 method: str, backbone: str) -> dict:
    """Shared tail of both eval paths: metrics + versioned CSV + txt."""
    y_test = np.asarray(y_test)
    y_pred = np.asarray(y_pred)
    y_proba = np.asarray(y_proba)
    test_acc = accuracy(y_test, y_pred)
    test_qkv = cohen_kappa_quadratic(y_test, y_pred)
    test_auc = roc_auc_ovr_macro(y_test, y_proba)
    logging.info(f"Test Accuracy: {test_acc}")
    logging.info(f"Test Quadratic Kappa: {test_qkv}")
    logging.info(f"Test AUC: {test_auc}")

    out_df = valid_df.copy()
    out_df["outputs"] = y_pred.tolist()
    out_df["mri_path"] = out_df["mri_path"].apply(os.path.basename)
    out_df = out_df[["mri_path", "outputs"]]

    os.makedirs(results_dir, exist_ok=True)
    csv_path = versioned_path(
        results_dir,
        f"{method}_{backbone.replace('-', '_')}_eval_results_v{{version}}.csv",
    )
    out_df.to_csv(csv_path, index=False)
    logging.info(f"Results saved to {csv_path}")
    with open(os.path.splitext(csv_path)[0] + "_metrics.txt", "w") as f:
        f.write(f"Test Accuracy: {test_acc}\n")
        f.write(f"Test Quadratic Kappa: {test_qkv}\n")
        f.write(f"Test AUC: {test_auc}\n")
    return {"accuracy": test_acc, "kappa": test_qkv, "auc": test_auc, "csv": csv_path}


def evaluate_artifact(artifact: str, data_path: str, results_dir: str,
                      image_folder: str | None = None) -> dict:
    """Evaluate a deployment artifact (gaviko-export zip) on the labeled
    ``val`` subset — same metrics/outputs as :func:`evaluate`, but the
    forward comes from the serialized module: no config, no model build,
    no weight conversion. Validates the exact unit that will be served."""
    from gaviko_tpu.deploy import DeployedPredictor

    pred = DeployedPredictor(artifact)
    df = pd.read_csv(data_path)
    valid_df = split_dataframe(df, "val")
    if len(valid_df) == 0:
        raise ValueError(f"no rows with subset=='val' in {data_path}")
    paths = [
        os.path.join(image_folder, p) if image_folder else p
        for p in valid_df["mri_path"].tolist()
    ]
    y_test = valid_df["kl_grade"].tolist()
    y_pred, y_proba = [], []
    # Chunk the outer loop to bound HOST memory: predict_logits re-chunks
    # to pred.batch_size internally for the device, but would otherwise
    # require every decoded volume resident in host RAM at once. Loading
    # pred.batch_size volumes per outer iteration keeps the host footprint
    # at one device batch.
    for i in range(0, len(paths), pred.batch_size):
        vols = [np.load(p)["data"] for p in paths[i: i + pred.batch_size]]
        logits = pred.predict_logits(vols)
        y_pred.extend(np.argmax(logits, axis=1).tolist())
        p = np.exp(logits - logits.max(-1, keepdims=True))
        y_proba.extend((p / p.sum(-1, keepdims=True)).tolist())

    mc = pred.meta["model_config"]
    return _finish_eval(valid_df, y_test, y_pred, y_proba, results_dir,
                        mc["method"], str(mc.get("backbone", "none")))


def evaluate(config: dict) -> dict:
    logging.info(f"Devices: {jax.devices()}")
    df = pd.read_csv(config["data"]["data_path"])
    valid_df = split_dataframe(df, "val")
    if len(valid_df) == 0:
        raise ValueError(
            f"no rows with subset=='val' in {config['data']['data_path']}"
        )
    ds = dataset_from_dataframe(
        valid_df, T.eval_transform, False, config["data"].get("image_folder")
    )
    # pad_to_batch avoids recompiling the eval graph for the ragged final
    # batch; predictions for pad rows are sliced off below via n_valid.
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
    if not ckpt:
        logging.info(
            f"Model path is not provided. {config['model']['method']} weights "
            f"are initialized randomly."
        )
    params = build_params(
        model, jax.random.PRNGKey(0),
        pretrained_dir=config["model"].get("pretrained_dir", "./pretrained"),
        checkpoint_path=ckpt,
    )
    if config["utils"].get("quantize") == "int8":
        # Same w8a8 sidecar quantization the serving path uses
        # (serve.py --quantize int8): validates a quantized checkpoint
        # through the REAL metrics path (accuracy/kappa/AUC) instead of
        # synthetic-logit agreement only.
        from gaviko_tpu.ops.int8_linear import quantize_backbone

        logging.info("Evaluating with int8 (w8a8) backbone GEMMs")
        params = quantize_backbone(params, model.spec.depth)
    trainable, frozen = split_params(model, params)
    import optax

    _, eval_step, _ = make_steps(
        model, make_criterion(config["train"]), optax.identity()
    )

    y_test, y_pred, y_proba = [], [], []
    for inputs, labels, n_valid in loader:
        _, _, logits = eval_step(trainable, frozen, put_volume(inputs), jnp.asarray(labels))
        logits = np.asarray(logits)[:n_valid]
        y_test.extend(labels[:n_valid].tolist())
        y_pred.extend(np.argmax(logits, axis=1).tolist())
        p = np.exp(logits - logits.max(-1, keepdims=True))
        y_proba.extend((p / p.sum(-1, keepdims=True)).tolist())

    return _finish_eval(
        valid_df, y_test, y_pred, y_proba, config["utils"]["results_dir"],
        config["model"]["method"], config["model"]["backbone"])


def main():
    parser = argparse.ArgumentParser(description="Inference script for Gaviko model")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--artifact", type=str, default=None,
                        help="evaluate a deployment artifact (gaviko-export "
                             "output) instead of building from --config; "
                             "requires --data_path")
    parser.add_argument("--data_path", type=str, default=None,
                        help="labels CSV with mri_path/kl_grade/subset (with "
                             "--artifact; --config runs take data.data_path)")
    parser.add_argument("--image_folder", type=str, default=None,
                        help="npz folder the CSV's mri_path is relative to "
                             "(with --artifact)")
    parser.add_argument("--results_dir", type=str, default="./outputs")
    parser.add_argument("--checkpoint", type=str, required=False)
    # default=None so an *explicit* --method in artifact mode can be
    # rejected below; --config runs fall back to the reference's default
    # ("gaviko", ref src/eval.py argparse default).
    parser.add_argument("--method", type=str, default=None,
                        choices=list(METHODS),
                        help="PEFT method (--config runs only; artifacts "
                             "bake the method in at export time)")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="evaluate with the serving path's w8a8 "
                             "quantization (validates the quantized "
                             "checkpoint through the metrics path)")
    args = parser.parse_args()

    if (args.config is None) == (args.artifact is None):
        parser.error("exactly one of --config or --artifact is required")
    if args.artifact is not None:
        if args.data_path is None:
            parser.error("--artifact requires --data_path (labels CSV)")
        if args.checkpoint is not None:
            parser.error("--checkpoint is baked into the artifact at export "
                         "time; not accepted with --artifact")
        if args.method is not None:
            parser.error("--method is baked into the artifact at export "
                         "time; not accepted with --artifact")
        if args.quantize is not None:
            parser.error("--quantize applies to --config runs; artifacts "
                         "bake their precision in at export time")
        os.makedirs(args.results_dir, exist_ok=True)
        setup_logging(log_dir=args.results_dir)
        evaluate_artifact(args.artifact, args.data_path, args.results_dir,
                          image_folder=args.image_folder)
        return

    if args.data_path is not None:
        parser.error("--data_path applies to --artifact runs only; --config "
                     "runs read data.data_path from the YAML")
    if args.image_folder is not None:
        parser.error("--image_folder applies to --artifact runs only; "
                     "--config runs read data.image_folder from the YAML")

    config = load_config(args.config)
    # No explicit --method and no method in the YAML: fall back to the
    # reference's argparse default (ref src/eval.py — "gaviko"); most
    # packaged configs carry no model.method key and downstream code
    # (results filenames, _finish_eval) requires one.
    if args.method is None and not config["model"].get("method"):
        args.method = "gaviko"
    apply_method_override(config, args.method)
    config["utils"]["results_dir"] = args.results_dir or config["utils"].get("results_dir")
    config["utils"]["checkpoint"] = args.checkpoint
    if args.quantize is not None:
        config["utils"]["quantize"] = args.quantize
    os.makedirs(config["utils"]["results_dir"], exist_ok=True)
    setup_logging(log_dir=config["utils"]["results_dir"])
    logging.info(f"Config: {config}")
    evaluate(config)


if __name__ == "__main__":
    main()
