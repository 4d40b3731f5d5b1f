"""Packaging surface: console entry points + packaged-config fallback.

The reference is run as loose scripts (``python src/train.py ...``); this
framework additionally installs as a package (pyproject.toml) with
``gaviko-train/eval/infer/serve/convert`` console scripts backed by
``gaviko_tpu.cli``. The repo-root shims must keep re-exporting the functions
the reference-style invocation (and this test suite) uses.
"""

import os


def test_root_shims_reexport_cli():
    import eval as eval_mod
    import inference as infer_mod
    import serve as serve_mod
    import train as train_mod

    from gaviko_tpu.cli import evaluate, infer, serve, train

    assert train_mod.train is train.train
    assert train_mod.make_loaders is train.make_loaders
    assert train_mod.main is train.main
    assert eval_mod.evaluate is evaluate.evaluate
    assert eval_mod.versioned_path is evaluate.versioned_path
    assert infer_mod.inference is infer.inference
    assert serve_mod.main is serve.main


def test_console_entry_points_resolve():
    # Every [project.scripts] target must import and be callable.
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    import importlib

    for name, target in meta["project"]["scripts"].items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_load_config_packaged_fallback(tmp_path, monkeypatch):
    # A config path that doesn't exist resolves against the packaged
    # gaviko_tpu/configs/ by basename — installed console scripts work
    # outside a checkout.
    from gaviko_tpu.config import load_config

    monkeypatch.chdir(tmp_path)  # no local gaviko_tpu/configs here
    cfg = load_config("gaviko.yaml")
    assert cfg["model"]["backbone"] == "vit-l16"
    cfg2 = load_config("some/nonexistent/prefix/vit.yaml")
    assert cfg2["model"]["backbone"].startswith("vit")

    # Existing paths win over the packaged fallback.
    local = tmp_path / "gaviko.yaml"
    local.write_text("model: {method: custom}\n")
    assert load_config(str(local))["model"]["method"] == "custom"


def test_package_data_globs_cover_runtime_assets():
    # The wheel must carry the YAML configs and the C++ loader source the
    # runtime builds lazily (data/native_loader.py).
    import glob

    import gaviko_tpu

    pkg = os.path.dirname(gaviko_tpu.__file__)
    assert glob.glob(os.path.join(pkg, "configs", "*.yaml"))
    assert glob.glob(os.path.join(pkg, "native", "*.cpp"))
