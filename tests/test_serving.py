"""Serving: AOT predictor correctness + HTTP endpoint round trip."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaviko_tpu.serving import Predictor, serve
from tests.test_end_to_end import tiny_config, make_synth_dataset


@pytest.fixture(scope="module")
def predictor(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=1)
    config = tiny_config(root, csv_path, volumes)
    return Predictor(config, batch_size=2, dtype="float32", pretrained_dir=None)


def test_predictor_matches_direct_apply(predictor):
    rng = np.random.RandomState(0)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(3)]
    logits = predictor.predict_logits(vols)
    assert logits.shape == (3, 5)

    from gaviko_tpu.data.transforms import eval_transform

    batch = jnp.asarray(np.stack([eval_transform(np.expand_dims(v, 0)) for v in vols]))
    want = np.asarray(predictor.model.apply(predictor.params, batch, predictor.spec))
    np.testing.assert_allclose(logits, want, atol=1e-5)

    classes = predictor.predict(vols)
    assert (classes == logits.argmax(-1)).all()


def test_http_endpoint(predictor):
    server = serve(predictor, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"

        vol = np.random.RandomState(1).rand(24, 32, 32).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, data=vol)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert len(out["logits"]) == 5
        assert 0 <= out["class"] < 5

        # Probe: malformed body -> clean 400, server stays alive.
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not-an-npz", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
    finally:
        server.shutdown()


def test_batch_queue_coalesces(predictor):
    from gaviko_tpu.serving import BatchQueue

    calls = []
    orig = predictor.predict_logits

    def counting(vols):
        calls.append(len(vols))
        return orig(vols)

    predictor.predict_logits = counting
    bq = BatchQueue(predictor, max_wait_ms=200.0)
    try:
        rng = np.random.RandomState(1)
        vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(2)]
        results = [None, None]

        def worker(i):
            results[i] = bq.submit(vols[i])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        want = orig(vols)
        for i in range(2):
            np.testing.assert_allclose(results[i], want[i], atol=1e-5)
        # Both requests ran in one coalesced device batch.
        assert calls == [2], calls
    finally:
        predictor.predict_logits = orig
        bq.close()


def test_batch_queue_propagates_errors(predictor):
    from gaviko_tpu.serving import BatchQueue

    orig = predictor.predict_logits
    predictor.predict_logits = lambda vols: (_ for _ in ()).throw(
        ValueError("boom"))
    bq = BatchQueue(predictor, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="boom"):
            bq.submit(np.zeros((24, 32, 32), np.float32))
    finally:
        predictor.predict_logits = orig
        bq.close()


def test_reload_checkpoint_swaps_weights(predictor, tmp_path):
    import torch

    rng = np.random.RandomState(2)
    vols = [rng.rand(24, 32, 32).astype(np.float32)]
    before = predictor.predict_logits(vols)
    # Write a head-only overlay with shifted bias; logits must move by it.
    shift = np.arange(5, dtype=np.float32)
    ckpt = {
        "mlp_head.bias": torch.tensor(
            np.asarray(predictor.params["mlp_head.bias"], np.float32) + shift
        ),
    }
    path = str(tmp_path / "overlay.pt")
    torch.save(ckpt, path)
    old = predictor.params
    predictor.reload_checkpoint(path)
    assert predictor.params is not old
    after = predictor.predict_logits(vols)
    np.testing.assert_allclose(after - before, np.tile(shift, (1, 1)),
                               atol=1e-3)


def test_auth_token_and_body_cap(predictor):
    server = serve(predictor, port=0, auth_token="s3cret", max_body_bytes=1024)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        vol = np.random.RandomState(1).rand(24, 32, 32).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, data=vol)
        body = buf.getvalue()

        # No token -> 401.
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 401

        # Correct token but oversized body -> 413.
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST",
            headers={"Authorization": "Bearer s3cret"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 413

        # Reload outside the (unset -> everything allowed) is separate; here
        # token-gated /reload with bad token -> 401.
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"{}", method="POST",
            headers={"Authorization": "Bearer wrong"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 401

        # GETs stay open (health/metrics are unauthenticated reads).
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()
    # server_close also stops the batching dispatcher.
    assert not server.batcher._thread.is_alive()


def test_reload_restricted_to_checkpoint_dir(predictor, tmp_path):
    allowed = tmp_path / "ckpts"
    allowed.mkdir()
    server = serve(predictor, port=0, checkpoint_dir=str(allowed))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload",
            data=json.dumps({"checkpoint": "/etc/passwd"}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 403
    finally:
        server.shutdown()
        server.server_close()


def test_metrics_endpoint(predictor):
    server = serve(predictor, port=0)
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
        urllib.request.urlopen(req).read()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            m = json.load(r)
        assert m["requests_total"] >= 1
        assert m["batches_total"] >= 1
        assert m["latency_p50_ms"] > 0
        assert 0 < m["mean_batch_occupancy"] <= predictor.batch_size
    finally:
        server.shutdown()
        server.server_close()


def test_predict_snapshots_params_across_chunks(predictor):
    """A reload mid-request must not mix weights across micro-batch chunks."""
    rng = np.random.RandomState(3)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(4)]  # 2 chunks
    want = predictor.predict_logits(vols)

    old_params = predictor.params
    real_compiled = predictor._compiled
    calls = {"n": 0}

    def hijack(params, batch):
        calls["n"] += 1
        if calls["n"] == 1:
            # Simulate a concurrent reload landing between chunks.
            predictor.params = "poisoned"
        assert params is old_params, "chunk used post-reload params"
        return real_compiled(params, batch)

    predictor._compiled = hijack
    try:
        got = predictor.predict_logits(vols)
    finally:
        predictor._compiled = real_compiled
        predictor.params = old_params
    assert calls["n"] == 2
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_predictor_mesh_parallel(tmp_path_factory):
    """DP2xTP2 predictor on the virtual CPU mesh == single-device logits."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    root = str(tmp_path_factory.mktemp("serve_mesh"))
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=1)
    config = tiny_config(root, csv_path, volumes)
    single = Predictor(config, batch_size=2, dtype="float32",
                       pretrained_dir=None)
    meshp = Predictor(config, batch_size=2, dtype="float32",
                      pretrained_dir=None, mesh_shape=(2, 2))
    rng = np.random.RandomState(3)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(4)]
    np.testing.assert_allclose(
        meshp.predict_logits(vols), single.predict_logits(vols), atol=2e-5)


def test_predictor_int8_quantize(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve_q"))
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=1)
    config = tiny_config(root, csv_path, volumes)
    base = Predictor(config, batch_size=2, dtype="float32",
                     pretrained_dir=None)
    quant = Predictor(config, batch_size=2, dtype="float32",
                      pretrained_dir=None, quantize="int8")
    from gaviko_tpu.ops.int8_linear import INT8_SUFFIX
    assert any(k.endswith(INT8_SUFFIX) for k in quant.params)
    rng = np.random.RandomState(4)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(3)]
    a = base.predict_logits(vols)
    b = quant.predict_logits(vols)
    rel = np.abs(a - b).mean() / max(np.abs(a).mean(), 1e-9)
    assert rel < 5e-2, rel


def test_predictor_int8_quantize_mesh_parallel(tmp_path_factory):
    """int8 sidecar params compose with the DP x TP mesh predictor: the
    sidecar keys route through shardings_for_params (falling back to
    replication where no TP rule matches) and the int8 kernels run under
    the sharded forward. Must match the single-device int8 predictor."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    root = str(tmp_path_factory.mktemp("serve_q_mesh"))
    csv_path, volumes = make_synth_dataset(root, n_train=2, n_val=1)
    config = tiny_config(root, csv_path, volumes)
    single = Predictor(config, batch_size=2, dtype="float32",
                       pretrained_dir=None, quantize="int8")
    meshq = Predictor(config, batch_size=2, dtype="float32",
                      pretrained_dir=None, quantize="int8",
                      mesh_shape=(2, 2))
    rng = np.random.RandomState(5)
    vols = [rng.rand(24, 32, 32).astype(np.float32) for _ in range(3)]
    np.testing.assert_allclose(
        meshq.predict_logits(vols), single.predict_logits(vols), atol=2e-5)
