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
