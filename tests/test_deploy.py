"""AOT deployment artifacts: export -> DeployedPredictor round trip.

The reference has no deployment story (inference.py rebuilds the torch
model from config each run); gaviko_tpu.deploy packages the traced forward
+ weights into one zip. These tests pin the contract: artifact logits ==
live-Predictor logits, hot reload works (with int8 sidecar refresh), and
the platform/version gates refuse bad artifacts up front.
"""

import io
import json
import os
import zipfile

import numpy as np
import pytest
import torch

from gaviko_tpu.deploy import (
    ARTIFACT_VERSION,
    _META_NAME,
    DeployedPredictor,
    export_artifact,
)
from gaviko_tpu.serving import Predictor
from tests.test_end_to_end import make_synth_dataset, tiny_config


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deploy"))
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=1)
    config = tiny_config(root, csv_path, volumes)
    path = root + "/model.gaviko"
    meta = export_artifact(
        config, path, batch_size=2, dtype="float32", pretrained_dir=None
    )
    return config, path, meta


def _tamper(src, dst, **meta_updates):
    """Copy artifact zip with patched manifest fields."""
    with zipfile.ZipFile(src) as z:
        members = {n: z.read(n) for n in z.namelist()}
    meta = json.loads(members[_META_NAME].decode())
    meta.update(meta_updates)
    members[_META_NAME] = json.dumps(meta).encode()
    with zipfile.ZipFile(dst, "w") as z:
        for n, b in members.items():
            z.writestr(n, b)


def test_manifest(exported):
    _, _, meta = exported
    assert meta["artifact_version"] == ARTIFACT_VERSION
    assert meta["platforms"] == ["cpu"]
    assert meta["batch_size"] == 2
    assert meta["dtype"] == "float32"
    assert meta["num_classes"] == 5
    assert set(meta["param_shapes"]) == set(meta["param_dtypes"])


def test_artifact_matches_live_predictor(exported):
    config, path, _ = exported
    dep = DeployedPredictor(path)
    live = Predictor(config, batch_size=2, dtype="float32",
                     pretrained_dir=None)
    rng = np.random.RandomState(0)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(3)]
    got = dep.predict_logits(vols)  # 2 chunks, second padded
    want = live.predict_logits(vols)
    assert got.shape == (3, 5)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (dep.predict(vols) == want.argmax(-1)).all()


def test_reload_checkpoint_overlays(exported, tmp_path):
    _, path, _ = exported
    dep = DeployedPredictor(path)
    rng = np.random.RandomState(2)
    vols = [rng.rand(24, 32, 32).astype(np.float32)]
    before = dep.predict_logits(vols)
    shift = np.arange(5, dtype=np.float32)
    ckpt = {
        "mlp_head.bias": torch.tensor(
            np.asarray(dep.params["mlp_head.bias"], np.float32) + shift
        )
    }
    p = str(tmp_path / "overlay.pt")
    torch.save(ckpt, p)
    old = dep.params
    dep.reload_checkpoint(p)
    assert dep.params is not old  # atomic swap, not in-place mutation
    after = dep.predict_logits(vols)
    np.testing.assert_allclose(after - before, shift[None], atol=1e-4)

    with pytest.raises(ValueError, match="requires a checkpoint"):
        dep.reload_checkpoint(None)
    bad = {"not.a.param": torch.zeros(3)}
    pb = str(tmp_path / "bad.pt")
    torch.save(bad, pb)
    with pytest.raises(KeyError, match="not in the artifact"):
        dep.reload_checkpoint(pb)
    wrong = {"mlp_head.bias": torch.zeros(7)}
    pw = str(tmp_path / "wrong.pt")
    torch.save(wrong, pw)
    with pytest.raises(ValueError, match="shape mismatch"):
        dep.reload_checkpoint(pw)


def test_platform_gate(exported, tmp_path):
    _, path, _ = exported
    bad = str(tmp_path / "tpu_only.gaviko")
    _tamper(path, bad, platforms=["tpu"])
    with pytest.raises(RuntimeError, match="backend is 'cpu'"):
        DeployedPredictor(bad)


def test_version_gate(exported, tmp_path):
    _, path, _ = exported
    bad = str(tmp_path / "future.gaviko")
    _tamper(path, bad, artifact_version=ARTIFACT_VERSION + 1)
    with pytest.raises(RuntimeError, match="newer"):
        DeployedPredictor(bad)


def test_int8_export_and_sidecar_refresh(tmp_path_factory, tmp_path):
    root = str(tmp_path_factory.mktemp("deploy_q"))
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=1)
    config = tiny_config(root, csv_path, volumes)
    path = root + "/model_q.gaviko"
    export_artifact(config, path, batch_size=2, dtype="float32",
                    pretrained_dir=None, quantize="int8")
    dep = DeployedPredictor(path)
    from gaviko_tpu.ops.int8_linear import INT8_SUFFIX

    sidecars = [k for k in dep.params if k.endswith(INT8_SUFFIX)]
    assert sidecars

    rng = np.random.RandomState(4)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(2)]
    base = Predictor(config, batch_size=2, dtype="float32",
                     pretrained_dir=None)
    a = base.predict_logits(vols)
    b = dep.predict_logits(vols)
    rel = np.abs(a - b).mean() / max(np.abs(a).mean(), 1e-9)
    assert rel < 5e-2, rel

    # Overlaying a quantized weight must re-quantize its sidecar.
    k = sidecars[0][: -len(INT8_SUFFIX)]
    old_sidecar = np.asarray(dep.params[sidecars[0]]).copy()
    new_w = np.asarray(dep.params[k], np.float32) * 2.0 + 0.1
    p = str(tmp_path / "w.pt")
    torch.save({k: torch.tensor(new_w)}, p)
    dep.reload_checkpoint(p)
    assert not np.array_equal(np.asarray(dep.params[sidecars[0]]), old_sidecar)


def test_mesh_artifact_matches_single_device(exported, tmp_path):
    """DP2xTP2 artifact: shardings baked at export, placements reconstructed
    from the module's own input shardings at load — logits must match the
    single-device artifact."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    config, single_path, _ = exported
    path = str(tmp_path / "mesh.gaviko")
    meta = export_artifact(
        config, path, batch_size=2, dtype="float32", pretrained_dir=None,
        mesh_shape=(2, 2),
    )
    assert meta["mesh_shape"] == [2, 2]
    dep = DeployedPredictor(path)
    single = DeployedPredictor(single_path)
    rng = np.random.RandomState(7)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(3)]
    np.testing.assert_allclose(
        dep.predict_logits(vols), single.predict_logits(vols), atol=2e-5)

    # Hot reload works on the mesh path too (re-commits sharded params).
    import torch

    shift = np.arange(5, dtype=np.float32)
    ckpt = {"mlp_head.bias": torch.tensor(
        np.asarray(dep.params["mlp_head.bias"], np.float32) + shift)}
    p = str(tmp_path / "mesh_overlay.pt")
    torch.save(ckpt, p)
    before = dep.predict_logits(vols[:1])
    dep.reload_checkpoint(p)
    after = dep.predict_logits(vols[:1])
    np.testing.assert_allclose(after - before, shift[None], atol=1e-4)


def test_mesh_artifact_bad_batch_divisibility(exported):
    config, _, _ = exported
    with pytest.raises(ValueError, match="divide the data axis"):
        export_artifact(config, "/dev/null", batch_size=3, dtype="float32",
                        pretrained_dir=None, mesh_shape=(2, 2))


def test_params_are_device_resident(exported):
    """Weights must transfer at load time, not per request."""
    config, path, _ = exported
    dep = DeployedPredictor(path)
    import jax

    for v in dep._device_params.values():
        assert isinstance(v, jax.Array)


# Method-specific tiny-geometry ctor extras (mirrors the parity suites).
_ZOO_EXTRAS = {
    "gaviko": dict(
        freeze_vit=True, num_prompts=5, prompt_latent_dim=12, local_dim=12,
        local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.2, proj_drop=0.2,
        share_factor=1,
    ),
    "evp": dict(
        freeze_vit=True, scale_factor=4, input_type="fft", freq_nums=0.25,
        handcrafted_tune=True, embedding_tune=True,
    ),
    "shallow_vpt": dict(
        freeze_vit=True, num_prompts=4, prompt_dim=16, prompt_dropout=0.1,
        deep_prompt=False,
    ),
    "deep_vpt": dict(
        freeze_vit=True, num_prompts=4, prompt_dim=16, prompt_dropout=0.1,
        deep_prompt=True,
    ),
    "adaptformer": dict(freeze_vit=True),
    "ssf": dict(freeze_vit=True),
    "dvpt": dict(freeze_vit=True, num_prompts=6, pool="mean"),
    "melo": dict(freeze_vit=True, r=4, alpha=4),
}


@pytest.mark.parametrize("method", sorted(
    __import__("gaviko_tpu.config", fromlist=["METHODS"]).METHODS))
def test_zoo_artifact_roundtrip(method, exported, tmp_path):
    """Every PEFT method's forward must survive jax.export serialization
    (FFT prompts, dual-stream local-mask kernels, LoRA qkv override, ...)
    and reproduce the live Predictor's logits from the artifact."""
    config, _, _ = exported
    config = json.loads(json.dumps(config))  # deep copy
    config["model"]["method"] = method
    config["model"].update(_ZOO_EXTRAS.get(method, {}))
    path = str(tmp_path / f"{method}.gaviko")
    export_artifact(config, path, batch_size=2, dtype="float32",
                    pretrained_dir=None)
    dep = DeployedPredictor(path)
    live = Predictor(config, batch_size=2, dtype="float32",
                     pretrained_dir=None)
    rng = np.random.RandomState(11)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(2)]
    np.testing.assert_allclose(
        dep.predict_logits(vols), live.predict_logits(vols), atol=1e-5)


def test_infer_cli_artifact_folder(exported, tmp_path):
    """gaviko-infer --artifact: folder scan -> versioned argmax CSV, same
    contract as the reference's inference.py but with no model build."""
    import pandas as pd

    from gaviko_tpu.cli.infer import inference_artifact

    config, path, _ = exported
    folder = config["data"]["image_folder"]
    out = inference_artifact(path, folder, str(tmp_path / "outputs"))
    assert out.endswith("_inference_results_v1.csv")
    df = pd.read_csv(out)
    assert list(df.columns) == ["mri_path", "outputs"]
    n_npz = len([f for f in os.listdir(folder) if f.endswith(".npz")])
    assert len(df) == n_npz
    # Classes must match the artifact predictor applied directly.
    dep = DeployedPredictor(path)
    for _, row in df.iterrows():
        vol = np.load(os.path.join(folder, row["mri_path"]))["data"]
        assert row["outputs"] == int(dep.predict([vol])[0])


def test_serve_accepts_deployed_predictor(exported):
    import threading
    import urllib.request

    from gaviko_tpu.serving import serve

    _, path, _ = exported
    dep = DeployedPredictor(path)
    server = serve(dep, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        vol = np.random.RandomState(1).rand(24, 32, 32).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, data=vol)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert len(out["logits"]) == 5
    finally:
        server.shutdown()
        server.server_close()


def test_eval_cli_artifact(exported, tmp_path):
    """gaviko-eval --artifact: val-subset metrics + versioned CSV from the
    serialized forward — the exact served unit gets validated, no model
    build. Predictions must match the artifact predictor applied directly."""
    import pandas as pd

    from gaviko_tpu.cli.evaluate import evaluate_artifact

    config, path, _ = exported
    out = evaluate_artifact(
        path, config["data"]["data_path"], str(tmp_path / "outputs"),
        image_folder=config["data"]["image_folder"])
    assert set(out) == {"accuracy", "kappa", "auc", "csv"}
    assert out["csv"].endswith("_eval_results_v1.csv")
    metrics_txt = os.path.splitext(out["csv"])[0] + "_metrics.txt"
    assert os.path.exists(metrics_txt)
    df = pd.read_csv(out["csv"])
    assert list(df.columns) == ["mri_path", "outputs"]
    labels = pd.read_csv(config["data"]["data_path"])
    val = labels[labels["subset"] == "val"]
    assert len(df) == len(val)
    dep = DeployedPredictor(path)
    folder = config["data"]["image_folder"]
    for _, row in df.iterrows():
        vol = np.load(os.path.join(folder, row["mri_path"]))["data"]
        assert row["outputs"] == int(dep.predict([vol])[0])
    # Accuracy is consistent with the written predictions.
    acc = float((df["outputs"].to_numpy() == val["kl_grade"].to_numpy()).mean())
    assert abs(acc - out["accuracy"]) < 1e-9
