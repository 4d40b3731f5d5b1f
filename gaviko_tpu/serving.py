"""Serving: AOT-compiled batched predictor + a minimal HTTP endpoint.

The reference has no serving story (script-driven inference only,
src/inference.py). For production deployment this module provides:

- ``Predictor``: builds a model from config, overlays a trainable-only
  checkpoint on timm-converted weights, AOT-compiles the forward for a fixed
  micro-batch (jit lower/compile at startup, so first request pays no
  compile), pads ragged batches, optional bf16 weights/compute.
- ``serve`` / serve.py CLI: stdlib HTTP server; POST /predict with an .npz
  body (key ``data``) returns JSON logits + argmax class; GET /healthz.
"""

from __future__ import annotations

import io
import json
import logging
from typing import Optional, Sequence

import numpy as np


class Predictor:
    def __init__(
        self,
        config: dict,
        checkpoint: Optional[str] = None,
        batch_size: int = 8,
        dtype: str = "bfloat16",
        pretrained_dir: Optional[str] = "./pretrained",
    ):
        import jax
        import jax.numpy as jnp

        from gaviko_tpu.models.factory import build_model
        from gaviko_tpu.models.pretrained import build_params
        from gaviko_tpu.data.transforms import eval_transform

        self._jnp = jnp
        self.batch_size = batch_size
        self.model = build_model(config["model"])
        self.spec = self.model.spec
        params = build_params(
            self.model, jax.random.PRNGKey(0),
            pretrained_dir=pretrained_dir, checkpoint_path=checkpoint,
        )
        cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.params = jax.tree.map(
            lambda t: t.astype(cdtype) if t.dtype == jnp.float32 else t, params
        )
        self._transform = eval_transform
        spec = self.spec
        shape = (
            batch_size, spec.channels, spec.frames, *spec.image_size
        )

        def forward(params, vol):
            return self.model.apply(params, vol, spec).astype(jnp.float32)

        # AOT compile for the fixed micro-batch shape.
        self._compiled = (
            jax.jit(forward)
            .lower(self.params, jax.ShapeDtypeStruct(shape, cdtype))
            .compile()
        )
        self._cdtype = cdtype
        logging.info(f"Predictor ready: micro-batch {shape}, {dtype}")

    def predict_logits(self, volumes: Sequence[np.ndarray]) -> np.ndarray:
        """volumes: list of (D, H, W) or (C, D, H, W) arrays -> [n, classes]."""
        jnp = self._jnp
        outs = []
        vols = [
            self._transform(
                v if v.ndim == 4 else np.expand_dims(v, 0)
            ) for v in volumes
        ]
        for i in range(0, len(vols), self.batch_size):
            chunk = vols[i : i + self.batch_size]
            n = len(chunk)
            if n < self.batch_size:
                chunk = chunk + [np.zeros_like(chunk[0])] * (self.batch_size - n)
            batch = jnp.asarray(np.stack(chunk)).astype(self._cdtype)
            logits = np.asarray(self._compiled(self.params, batch))
            outs.append(logits[:n])
        return np.concatenate(outs, axis=0) if outs else np.zeros((0, self.spec.num_classes))

    def predict(self, volumes: Sequence[np.ndarray]) -> np.ndarray:
        return self.predict_logits(volumes).argmax(axis=-1)


def serve(predictor: Predictor, host: str = "127.0.0.1", port: int = 8477):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logging.info("serve: " + fmt % args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                with np.load(io.BytesIO(raw)) as z:
                    vol = z["data"]
                logits = predictor.predict_logits([vol])[0]
                self._reply(200, {
                    "logits": [float(x) for x in logits],
                    "class": int(np.argmax(logits)),
                })
            except Exception as e:  # noqa: BLE001 - report to client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    logging.info(f"Serving on http://{host}:{port} (POST /predict, GET /healthz)")
    return server
