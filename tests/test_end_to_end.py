"""End-to-end train -> eval -> inference through the public entry points,
on a synthetic tiny dataset (the reference's CSV/npz contract)."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml


def make_synth_dataset(root, n_train=6, n_val=4, dhw=(24, 32, 32), classes=5, seed=0):
    rng = np.random.RandomState(seed)
    volumes = os.path.join(root, "volumes")
    os.makedirs(volumes, exist_ok=True)
    rows = []
    for i in range(n_train + n_val):
        name = f"vol_{i:03d}.npz"
        np.savez(os.path.join(volumes, name), data=rng.rand(*dhw).astype(np.float32))
        # Single-class labels: a couple of bias-only training epochs push the
        # head toward class 2, so val accuracy rises above 0 and the
        # best-checkpoint save path (gated on val_acc > max) is exercised.
        rows.append({
            "mri_path": name,
            "kl_grade": 2,
            "subset": "train" if i < n_train else "val",
        })
    csv_path = os.path.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path, volumes


def tiny_config(root, csv_path, volumes, method="bitfit", epochs=2):
    return {
        "utils": {"log_dir": os.path.join(root, "log"), "phase": "train",
                  "results_dir": os.path.join(root, "outputs"), "checkpoint": None},
        "data": {"batch_size": 2, "num_workers": 2, "data_path": csv_path,
                 "image_folder": volumes, "test_data": csv_path},
        "model": {"image_size": 32, "image_patch_size": 16, "frames": 24,
                  "frame_patch_size": 12, "dropout": 0.1, "emb_dropout": 0.1,
                  "channels": 1, "num_classes": 5, "pool": "cls",
                  "backbone": "vit-t16", "method": method, "fp16": False},
        "train": {"num_epochs": epochs, "lr": 1e-4, "weight_decay": 1e-4,
                  "warmup_steps": 10, "loss_fn": "focal_loss", "optimizer": "adam",
                  "accumulation_steps": 1, "save_dir": os.path.join(root, "weights"),
                  "save_threshold": 0.0,
                  "scheduler": {"max_lr": 0.3, "pct_start": 0.3, "div_factor": 10.0,
                                "final_div_factor": 1000.0, "anneal_strategy": "cos",
                                "three_phase": False},
                  "patience": 15, "memory_verbose": False, "flops_calculation": False},
        "wandb": {"enable": False, "project": "t", "name": "t", "log_model": False,
                  "save_code": False, "dir": os.path.join(root, "log")},
    }


def test_train_eval_inference_roundtrip(tmp_path):
    import train as train_mod
    import eval as eval_mod
    import inference as infer_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes)

    result = train_mod.train(config)
    assert result["best_ckpt_path"] and os.path.exists(result["best_ckpt_path"])
    assert os.path.exists(result["csv_log"])
    log = pd.read_csv(result["csv_log"])
    from gaviko_tpu.utils.logging import TRAIN_LOG_FIELDS

    assert list(log.columns) == TRAIN_LOG_FIELDS
    # 2 epochs x (3 train + 2 val) batches of per-step rows.
    assert len(log) == 2 * (3 + 2)

    # Checkpoint payload is trainable-only (bias|head for bitfit).
    from gaviko_tpu.weights.torch_io import load_checkpoint

    ckpt = load_checkpoint(result["best_ckpt_path"])
    assert ckpt and all(("bias" in k or "head" in k) for k in ckpt)

    # ---- eval with the saved checkpoint ----
    config["utils"]["checkpoint"] = result["best_ckpt_path"]
    metrics = eval_mod.evaluate(config)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert os.path.exists(metrics["csv"])
    assert os.path.exists(metrics["csv"].replace(".csv", "") + "_metrics.txt")
    out = pd.read_csv(metrics["csv"])
    assert list(out.columns) == ["mri_path", "outputs"]
    assert len(out) == 4

    # Versioning: second eval writes _v2.
    metrics2 = eval_mod.evaluate(config)
    assert metrics2["csv"].endswith("_v2.csv")

    # ---- folder inference ----
    csv3 = infer_mod.inference(config)
    assert os.path.exists(csv3)
    res = pd.read_csv(csv3)
    assert len(res) == 10  # scans every npz in the folder
    assert set(res["outputs"]) <= set(range(5))


def test_training_reduces_loss_fft(tmp_path):
    """Full fine-tune on a learnable synthetic signal actually learns."""
    import train as train_mod

    root = str(tmp_path)
    # Labels correlated with a SPATIAL pattern along H (left/right bright
    # halves): per-volume min-max rescale preserves it and the train-time
    # RandomFlip along D (axes=0) doesn't disturb it.
    rng = np.random.RandomState(1)
    volumes = os.path.join(root, "volumes")
    os.makedirs(volumes)
    rows = []
    for i in range(12):
        label = i % 2
        vol = rng.rand(24, 32, 32).astype(np.float32) * 0.2
        if label:
            vol[:, :16] += 1.0
        else:
            vol[:, 16:] += 1.0
        name = f"v{i:02d}.npz"
        np.savez(os.path.join(volumes, name), data=vol)
        rows.append({"mri_path": name, "kl_grade": label,
                     "subset": "train" if i < 8 else "val"})
    csv_path = os.path.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    config = tiny_config(root, csv_path, volumes, method="fft", epochs=4)
    config["train"]["loss_fn"] = "cross_entropy"
    config["train"]["scheduler"]["max_lr"] = 1e-3  # full fine-tune needs a sane lr
    result = train_mod.train(config)
    assert result["best_val_acc"] >= 0.75, result


def test_gaviko_training_roundtrip(tmp_path):
    """Flagship training path (dual streams, local attention dropout, GPA)."""
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, method="gaviko", epochs=1)
    # tiny_config's max_lr=0.3 suits bias-only probes; real transforms explode
    config["train"]["scheduler"]["max_lr"] = 3e-3
    config["model"].update(
        freeze_vit=True, num_prompts=4, prompt_latent_dim=8, local_dim=8,
        local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.2, proj_drop=0.2,
        share_factor=2,
    )
    result = train_mod.train(config)
    import pandas as pd

    log = pd.read_csv(result["csv_log"])
    assert np.isfinite(log["train_step_loss"]).all()
    if result["best_ckpt_path"]:
        from gaviko_tpu.weights.torch_io import load_checkpoint

        ckpt = load_checkpoint(result["best_ckpt_path"])
        # trainable-only payload: head/prompt/local_attn names only
        assert all(
            ("head" in k or "prompt" in k or "local_attn" in k) for k in ckpt
        )


# Method-specific tiny hyperparameters for the integration matrix (small
# enough that 1 epoch on 6 volumes compiles+runs in seconds on CPU).
_MATRIX_CFGS = {
    "linear": {},
    "shallow_vpt": dict(freeze_vit=True, num_prompts=4, prompt_dim=16,
                        prompt_dropout=0.1, deep_prompt=False),
    "deep_vpt": dict(freeze_vit=True, num_prompts=4, prompt_dim=16,
                     prompt_dropout=0.1, deep_prompt=True),
    "adaptformer": dict(freeze_vit=True),
    "ssf": dict(freeze_vit=True),
    # dvpt's gated-prompt path moves logits slowly: at the matrix's 3e-3 it
    # needs many more steps before val acc (and the checkpoint gate) rises,
    # so it gets a higher probe LR (verified to reach val acc 1.0 here).
    "dvpt": dict(freeze_vit=True, num_prompts=6, pool="mean",
                 _max_lr=0.03),
    "melo": dict(freeze_vit=True, r=4, alpha=4),
    "evp": dict(freeze_vit=True, scale_factor=4),
}


@pytest.mark.parametrize("method", sorted(_MATRIX_CFGS))
def test_method_training_roundtrip(method, tmp_path):
    """Every PEFT method drives train -> trainable-only checkpoint ->
    eval-merge end to end. Forward parity alone does not cover this
    integration (spec surgery, optimizer masking, per-method checkpoint
    naming, the eval-side vanilla+overlay merge): the GAViKO DHW geometry
    crash shipped through a fully parity-green suite because nothing
    exercised the method x loop x config seams. bitfit/fft/gaviko have
    dedicated roundtrips above; this matrix covers the rest."""
    import train as train_mod
    import eval as eval_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=4, n_val=2)
    # 2 epochs: single-class labels pull the head toward class 2, but some
    # methods (dvpt's mean-pool path) need the second epoch before val acc
    # rises above 0 and the best-checkpoint gate (val_acc > max) fires.
    config = tiny_config(root, csv_path, volumes, method=method, epochs=2)
    mcfg = dict(_MATRIX_CFGS[method])
    config["train"]["scheduler"]["max_lr"] = mcfg.pop("_max_lr", 3e-3)
    config["model"].update(mcfg)

    result = train_mod.train(config)
    log = pd.read_csv(result["csv_log"])
    assert np.isfinite(log["train_step_loss"]).all(), method
    assert result["best_ckpt_path"] and os.path.exists(result["best_ckpt_path"])

    # Trainable-only payload: every saved leaf must be trainable under the
    # factory mask for this method (frozen backbone weights stay out).
    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.weights.torch_io import load_checkpoint

    model = build_model(config["model"])
    ckpt = load_checkpoint(result["best_ckpt_path"])
    assert ckpt, method
    untrainable = [k for k in ckpt if not model.trainable(k)]
    assert not untrainable, (method, untrainable[:5])

    # eval merges vanilla init + the saved overlay and produces metrics.
    config["utils"]["checkpoint"] = result["best_ckpt_path"]
    metrics = eval_mod.evaluate(config)
    assert 0.0 <= metrics["accuracy"] <= 1.0, method
    assert os.path.exists(metrics["csv"])


def test_pure_bf16_training_saves_torch_loadable_checkpoint(tmp_path):
    """pure_bf16 keeps trainable params in bf16; the best-checkpoint save
    must survive that (torch.from_numpy rejects ml_dtypes.bfloat16 outright
    — regression: the first val improvement used to crash the whole run).
    The saved .pt must hold real torch bfloat16 tensors and round-trip
    bit-exactly through load_checkpoint."""
    import train as train_mod

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root)
    config = tiny_config(root, csv_path, volumes, epochs=1)
    config["train"]["precision"] = "pure_bf16"

    result = train_mod.train(config)
    path = result["best_ckpt_path"]
    assert path and os.path.exists(path)

    import ml_dtypes
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert any(v.dtype == torch.bfloat16 for v in sd.values())

    from gaviko_tpu.weights.torch_io import load_checkpoint

    back = load_checkpoint(path)
    for k, v in back.items():
        want = np.asarray(result["params"][k])
        assert v.dtype == want.dtype, (k, v.dtype, want.dtype)
        if v.dtype == np.dtype(ml_dtypes.bfloat16):
            assert np.array_equal(v.view(np.uint16), want.view(np.uint16)), k
        else:
            assert np.array_equal(v, want), k


def test_eval_cli_method_defaults_to_gaviko_when_yaml_has_none(tmp_path, monkeypatch):
    """--method is optional; a config YAML without model.method must fall
    back to the reference's argparse default ("gaviko", ref src/eval.py)
    BEFORE evaluate() runs — downstream code (results filenames,
    _finish_eval) requires the key (regression: after --method's default
    became None for artifact-mode validation, such configs crashed with
    KeyError after the full eval compute)."""
    import sys

    import yaml

    import eval as eval_mod
    from gaviko_tpu.cli import evaluate as eval_cli

    root = str(tmp_path)
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=2)
    config = tiny_config(root, csv_path, volumes)
    del config["model"]["method"]  # most packaged configs carry no method
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    captured = {}
    monkeypatch.setattr(eval_cli, "evaluate",
                        lambda cfg: captured.update(cfg["model"]) or {})
    monkeypatch.setattr(
        sys, "argv",
        ["eval.py", "--config", cfg_path, "--results_dir",
         os.path.join(root, "outputs")])
    eval_mod.main()
    assert captured.get("method") == "gaviko"
