"""Serving: AOT-compiled batched predictor + a minimal HTTP endpoint.

The reference has no serving story (script-driven inference only,
src/inference.py). For production deployment this module provides:

- ``Predictor``: builds a model from config, overlays a trainable-only
  checkpoint on timm-converted weights, AOT-compiles the forward for a fixed
  micro-batch (jit lower/compile at startup, so first request pays no
  compile), pads ragged batches, optional bf16 weights/compute. Checkpoints
  hot-reload via ``reload_checkpoint`` (atomic params swap; in-flight calls
  finish on the old weights).
- ``BatchQueue``: cross-request batching — concurrent requests coalesce into
  one device batch (up to ``batch_size``, flushed after ``max_wait_ms``), so
  N concurrent single-volume requests cost ~1 forward instead of N padded
  ones.
- ``serve`` / serve.py CLI: stdlib HTTP server; POST /predict with an .npz
  body (key ``data``) returns JSON logits + argmax class; GET /healthz;
  POST /reload {"checkpoint": path} swaps weights without downtime.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from typing import Optional, Sequence

import numpy as np

from gaviko_tpu.utils.layouts import put_volume


class Predictor:
    def __init__(
        self,
        config: dict,
        checkpoint: Optional[str] = None,
        batch_size: int = 8,
        dtype: str = "bfloat16",
        pretrained_dir: Optional[str] = "./pretrained",
        quantize: Optional[str] = None,
        mesh_shape: Optional[tuple] = None,
    ):
        """``quantize='int8'``: opt-in w8a8 backbone GEMMs (per-channel
        int8 weights, dynamic per-row int8 activations; ops/int8_linear.py).
        The checkpoint/params contract is unchanged — quantization adds
        sidecar entries at load time and survives hot reloads.

        ``mesh_shape=(data, tp)``: mesh-parallel inference over
        ``data*tp`` devices (parallel/infer.py) — batch sharded over
        ``data``, Megatron-style TP over ``tp``. None (default) keeps the
        single-device AOT path."""
        import jax
        import jax.numpy as jnp

        from gaviko_tpu.models.factory import build_model
        from gaviko_tpu.data.transforms import eval_transform

        self._jax = jax
        self._jnp = jnp
        self.batch_size = batch_size
        self.model = build_model(config["model"])
        self.spec = self.model.spec
        self._pretrained_dir = pretrained_dir
        cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._cdtype = cdtype
        if quantize not in (None, "int8"):
            raise ValueError(f"Unknown quantize mode: {quantize!r}")
        self._quantize = quantize
        self._mesh_shape = tuple(mesh_shape) if mesh_shape else None
        self.params = self._load_params(checkpoint)
        self._transform = eval_transform
        spec = self.spec
        shape = (
            batch_size, spec.channels, spec.frames, *spec.image_size
        )

        if self._mesh_shape is not None:
            from gaviko_tpu.parallel.infer import parallel_predictor_fn

            fwd, sharded, mesh = parallel_predictor_fn(
                self.model, self.params, *self._mesh_shape,
            )
            self.params = sharded
            self._mesh = mesh
            self._compiled = fwd
            logging.info(
                f"Predictor ready: micro-batch {shape}, {dtype}, "
                f"mesh data={self._mesh_shape[0]} x tp={self._mesh_shape[1]}")
            return

        def forward(params, vol):
            return self.model.apply(params, vol, spec).astype(jnp.float32)

        # AOT compile for the fixed micro-batch shape. Lower from a CONCRETE
        # example batch committed by the same put_volume used at request
        # time: on direct-attached TPU hosts put_volume pins the row-major
        # layout (utils/layouts.py), and an executable lowered from a
        # ShapeDtypeStruct would bake the DEFAULT layout instead — the AOT
        # argument check then rejects every request batch.
        example = put_volume(np.zeros(shape, np.float32), cdtype)
        self._compiled = (
            jax.jit(forward).lower(self.params, example).compile()
        )
        logging.info(f"Predictor ready: micro-batch {shape}, {dtype}")

    def _load_params(self, checkpoint: Optional[str]):
        from gaviko_tpu.models.pretrained import build_params

        jax, jnp = self._jax, self._jnp
        params = build_params(
            self.model, jax.random.PRNGKey(0),
            pretrained_dir=self._pretrained_dir, checkpoint_path=checkpoint,
        )
        params = jax.tree.map(
            lambda t: t.astype(self._cdtype)
            if t.dtype == jnp.float32 else t,
            params,
        )
        if self._quantize == "int8":
            from gaviko_tpu.ops.int8_linear import quantize_backbone

            params = quantize_backbone(params, self.spec.depth)
        return params

    def reload_checkpoint(self, checkpoint: Optional[str]) -> None:
        """Hot-swap weights without recompiling or downtime: the compiled
        executable is shape/dtype-specialized, not weight-specialized, so a
        new params tree drops in atomically (in-flight predictions finish on
        the old reference)."""
        params = self._load_params(checkpoint)
        if self._mesh_shape is not None:
            from gaviko_tpu.parallel.mesh import shardings_for_params
            sh = shardings_for_params(
                params, self._mesh, tp=self._mesh_shape[1] > 1)
            params = {k: self._jax.device_put(v, sh[k])
                      for k, v in params.items()}
        self.params = params
        logging.info(f"Reloaded checkpoint {checkpoint!r}")

    def predict_logits(self, volumes: Sequence[np.ndarray]) -> np.ndarray:
        """volumes: list of (D, H, W) or (C, D, H, W) arrays -> [n, classes]."""
        jnp = self._jnp
        # Snapshot once so a concurrent reload_checkpoint cannot mix old and
        # new weights across micro-batch chunks of one request batch.
        params = self.params
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
            batch = put_volume(np.stack(chunk), self._cdtype)
            logits = np.asarray(self._compiled(params, batch))
            outs.append(logits[:n])
        return np.concatenate(outs, axis=0) if outs else np.zeros((0, self.spec.num_classes))

    def predict(self, volumes: Sequence[np.ndarray]) -> np.ndarray:
        return self.predict_logits(volumes).argmax(axis=-1)


class BatchQueue:
    """Cross-request batching: concurrent ``submit`` calls coalesce into one
    device batch of up to ``predictor.batch_size`` volumes; a partial batch
    flushes after ``max_wait_ms``. One dispatcher thread owns the device, so
    request handlers never contend for the TPU."""

    def __init__(self, predictor: Predictor, max_wait_ms: float = 5.0):
        self._predictor = predictor
        self._max_wait = max_wait_ms / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # Observability counters (read by the /metrics endpoint).
        self._lock = threading.Lock()
        self.requests_total = 0
        self.batches_total = 0
        self.occupancy_sum = 0
        self._latencies: "list[float]" = []  # seconds, most recent 1000
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def metrics(self) -> dict:
        """Snapshot: request count, mean batch occupancy, latency percentiles."""
        with self._lock:
            lat = sorted(self._latencies)
            n_b = self.batches_total
            out = {
                "requests_total": self.requests_total,
                "batches_total": n_b,
                "mean_batch_occupancy": (
                    self.occupancy_sum / n_b if n_b else 0.0
                ),
                "batch_size": self._predictor.batch_size,
            }
            for p in (50, 90, 99):
                out[f"latency_p{p}_ms"] = (
                    lat[min(len(lat) - 1, int(len(lat) * p / 100))] * 1000.0
                    if lat else 0.0
                )
        return out

    def submit(self, volume: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        """Blocking: returns the logits row for one (D,H,W)/(C,D,H,W) volume."""
        done = threading.Event()
        slot: dict = {}
        self._queue.put((volume, done, slot))
        if not done.wait(timeout):
            raise TimeoutError("prediction timed out")
        if "error" in slot:
            raise slot["error"]
        return slot["logits"]

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def _run(self):
        bs = self._predictor.batch_size
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self._max_wait
            while len(batch) < bs:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            vols = [item[0] for item in batch]
            t0 = time.monotonic()
            try:
                logits = self._predictor.predict_logits(vols)
                for (_, done, slot), row in zip(batch, logits):
                    slot["logits"] = row
                    done.set()
            except Exception as e:  # noqa: BLE001 - deliver to every waiter
                for _, done, slot in batch:
                    slot["error"] = e
                    done.set()
            dt = time.monotonic() - t0
            with self._lock:
                self.requests_total += len(batch)
                self.batches_total += 1
                self.occupancy_sum += len(batch)
                self._latencies.append(dt)
                if len(self._latencies) > 1000:
                    del self._latencies[: len(self._latencies) - 1000]


def serve(
    predictor: Predictor,
    host: str = "127.0.0.1",
    port: int = 8477,
    auth_token: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    max_body_bytes: int = 128 * 1024 * 1024,
):
    """Build (not start) the HTTP server.

    Hardening knobs:
    - ``auth_token``: when set, every POST must carry
      ``Authorization: Bearer <token>`` (401 otherwise). Required for
      non-localhost binds unless explicitly opted out.
    - ``checkpoint_dir``: when set, /reload may only load checkpoints under
      this directory (realpath-checked) — a client cannot point the server
      at arbitrary filesystem paths.
    - ``max_body_bytes``: POST bodies above this are rejected with 413
      before reading (an npz volume is ~37 MB fp32; default cap 128 MB).

    ``server_close()`` also stops the batching dispatcher thread.
    """
    import os

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = BatchQueue(predictor)
    ckpt_root = os.path.realpath(checkpoint_dir) if checkpoint_dir else None

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

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            header = self.headers.get("Authorization", "")
            return header == f"Bearer {auth_token}"

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._reply(200, batcher.metrics())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                if not self._authorized():
                    self._reply(401, {"error": "unauthorized"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length > max_body_bytes:
                    self._reply(413, {
                        "error": f"body {length} bytes exceeds cap "
                                 f"{max_body_bytes}",
                    })
                    return
                raw = self.rfile.read(length)
                if self.path == "/predict":
                    with np.load(io.BytesIO(raw)) as z:
                        vol = z["data"]
                    # Concurrent requests coalesce into one device batch.
                    logits = batcher.submit(vol)
                    self._reply(200, {
                        "logits": [float(x) for x in logits],
                        "class": int(np.argmax(logits)),
                    })
                elif self.path == "/reload":
                    payload = json.loads(raw.decode() or "{}")
                    ckpt = payload.get("checkpoint")
                    if ckpt is not None and ckpt_root is not None:
                        real = os.path.realpath(ckpt)
                        if not (real == ckpt_root
                                or real.startswith(ckpt_root + os.sep)):
                            self._reply(403, {
                                "error": "checkpoint outside allowed dir",
                            })
                            return
                    predictor.reload_checkpoint(ckpt)
                    self._reply(200, {"status": "reloaded"})
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 - report to client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    class Server(ThreadingHTTPServer):
        def server_close(self):  # stop the dispatcher with the server
            batcher.close()
            super().server_close()

    if host not in ("127.0.0.1", "localhost", "::1") and auth_token is None:
        logging.warning(
            "serve: binding %s without auth_token — /predict and /reload are "
            "open to the network", host,
        )
    server = Server((host, port), Handler)
    server.batcher = batcher  # exposed for tests/metrics
    logging.info(f"Serving on http://{host}:{port} (POST /predict, GET /healthz)")
    return server
