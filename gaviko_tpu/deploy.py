"""AOT deployment artifacts: serialized model forwards + weights in one file.

The reference has no deployment story beyond running its Python source
(`/root/reference/src/inference.py` rebuilds the torch model from config
every time). This module packages a model into a single self-contained
artifact that serves WITHOUT the model-building code:

- ``export_artifact``: builds the model + params exactly like
  :class:`gaviko_tpu.serving.Predictor` (timm-converted weights + optional
  trainable-only checkpoint overlay + optional int8 sidecars), traces the
  forward for a fixed micro-batch, and writes a zip containing the
  ``jax.export`` StableHLO module, the weights, and a JSON manifest.
- ``DeployedPredictor``: loads an artifact and exposes the same
  ``predict_logits`` / ``predict`` / ``reload_checkpoint`` surface as
  ``Predictor``, so ``gaviko_tpu.serving.serve`` and the batching queue
  accept it unchanged (``serve.py --artifact model.gaviko``).

What the artifact buys (and does not):

- **No model code at serve time** — the zip is the unit of deployment;
  config drift between trainer and server cannot change the math.
- **Version stability** — ``jax.export`` serialization carries a
  calling-convention version with a documented compatibility window,
  unlike pickled callables.
- **Cross-platform lowering** — export on a CPU host with
  ``platforms=("tpu",)`` produces a TPU-servable module. Kernel choice is
  made at trace time from the EXPORTING process's backend (compiled Pallas
  kernels on a TPU host, their XLA/interpret twins elsewhere); the manifest
  records which, and ``DeployedPredictor`` refuses a platform mismatch up
  front instead of at first request.
- It does **not** skip XLA compilation: the first call on the serving host
  compiles the deserialized module (the persistent compilation cache
  applies). It skips model build, weight conversion, and retracing.

Weights are stored inside the zip as an npz of raw little-endian buffers
with dtypes recorded in the manifest (npz itself cannot represent bf16).
"""

from __future__ import annotations

import io
import json
import logging
import zipfile
from typing import Optional, Sequence

import numpy as np

ARTIFACT_VERSION = 1
_MODULE_NAME = "module.jaxexport"
_PARAMS_NAME = "params.npz"
_META_NAME = "meta.json"


def _to_numpy_record(x) -> tuple[np.ndarray, str]:
    """jax array -> (raw uint8 buffer, dtype name). bf16/int8/f32 safe."""
    arr = np.asarray(x)
    return arr.view(np.uint8).reshape(-1), str(arr.dtype)


def _from_numpy_record(buf: np.ndarray, dtype: str, shape) -> np.ndarray:
    import ml_dtypes  # ships with jax; owns the bfloat16 numpy dtype

    np_dtype = np.dtype(getattr(ml_dtypes, dtype, dtype))
    return buf.view(np_dtype).reshape(shape)


def export_artifact(
    config: dict,
    path: str,
    checkpoint: Optional[str] = None,
    batch_size: int = 8,
    dtype: str = "bfloat16",
    pretrained_dir: Optional[str] = "./pretrained",
    quantize: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh_shape: Optional[tuple] = None,
) -> dict:
    """Trace + serialize the model forward and write the artifact zip.

    ``config`` is the full config dict (``config['model']`` drives the
    build, same contract as ``Predictor``). Returns the manifest dict.

    ``mesh_shape=(data, tp)`` exports a mesh-parallel forward (same
    partition rules as ``Predictor(mesh_shape=...)``: batch over ``data``,
    Megatron-style TP over ``tp``). The GSPMD shardings are baked into the
    serialized module; serving needs ``data*tp`` devices but NO partition-
    rule code — ``DeployedPredictor`` reconstructs placements from the
    module itself.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.models.pretrained import build_params

    model = build_model(config["model"])
    spec = model.spec
    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params = build_params(
        model, jax.random.PRNGKey(0),
        pretrained_dir=pretrained_dir, checkpoint_path=checkpoint,
    )
    params = jax.tree.map(
        lambda t: t.astype(cdtype) if t.dtype == jnp.float32 else t, params,
    )
    if quantize == "int8":
        from gaviko_tpu.ops.int8_linear import quantize_backbone

        params = quantize_backbone(params, spec.depth)
    elif quantize is not None:
        raise ValueError(f"Unknown quantize mode: {quantize!r}")

    def forward(p, x):
        return model.apply(p, x, spec).astype(jnp.float32)

    vol_shape = (batch_size, spec.channels, spec.frames, *spec.image_size)
    param_specs = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in params.items()
    }
    vol_spec = jax.ShapeDtypeStruct(vol_shape, cdtype)
    if mesh_shape is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gaviko_tpu.parallel.mesh import make_mesh, shardings_for_params

        data_ax, tp = mesh_shape
        if batch_size % data_ax:
            raise ValueError(
                f"batch_size {batch_size} must divide the data axis {data_ax}")
        mesh = make_mesh(data=data_ax, model=tp)
        p_sh = shardings_for_params(params, mesh, tp=tp > 1)
        fn = jax.jit(
            forward,
            in_shardings=({k: p_sh[k] for k in params},
                          NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P()),
        )
    else:
        fn = jax.jit(forward)
    # Mosaic kernels lower to the `tpu_custom_call` target, which jax.export
    # treats as unstable (the payload is Mosaic IR, versioned separately from
    # StableHLO). We accept it deliberately: the artifact pins its platform,
    # and the manifest records the exporting jax version for auditability.
    disabled = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    exported = jax_export.export(
        fn,
        platforms=tuple(platforms) if platforms else None,
        disabled_checks=disabled,
    )(param_specs, vol_spec)
    blob = exported.serialize()

    shapes = {k: list(v.shape) for k, v in params.items()}
    dtypes = {}
    buf = io.BytesIO()
    raw = {}
    for k, v in params.items():
        rec, dt = _to_numpy_record(v)
        # npz member names must be unique and /-safe; keys already are.
        raw[k] = rec
        dtypes[k] = dt
    np.savez(buf, **raw)

    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "batch_size": batch_size,
        "dtype": dtype,
        "quantize": quantize,
        "mesh_shape": list(mesh_shape) if mesh_shape else None,
        "num_classes": spec.num_classes,
        "input_shape": list(vol_shape),
        "model_config": config["model"],
        "param_shapes": shapes,
        "param_dtypes": dtypes,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta, indent=1, default=str))
        z.writestr(_MODULE_NAME, blob)
        z.writestr(_PARAMS_NAME, buf.getvalue())
    logging.info(
        f"Exported {spec.method}/{spec.backbone} to {path} "
        f"(platforms={meta['platforms']}, batch={batch_size}, {dtype})")
    return meta


class DeployedPredictor:
    """Serve from an artifact — same surface as ``serving.Predictor``.

    ``predict_logits`` / ``predict`` / ``batch_size`` / ``reload_checkpoint``
    match Predictor's contracts, so ``serving.serve`` and ``BatchQueue``
    work unchanged. ``reload_checkpoint`` overlays a trainable-only
    checkpoint onto the artifact's stored weights (the exported module takes
    params as ARGUMENTS, so hot-reload needs no re-export); int8 sidecars of
    overlaid keys are re-quantized so they never go stale.

    ``self.params`` holds the HOST copies (numpy — the overlay/requantize
    substrate); calls run on a device-committed snapshot so weights transfer
    once per (re)load, not per request. Mesh artifacts reconstruct their
    placements from the serialized module's own input shardings — no
    partition-rule code runs at serve time.
    """

    def __init__(self, path: str):
        import jax
        import jax.numpy as jnp
        from jax import export as jax_export

        self._jax = jax
        self._jnp = jnp
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read(_META_NAME).decode())
            blob = z.read(_MODULE_NAME)
            with np.load(io.BytesIO(z.read(_PARAMS_NAME))) as npz:
                self.params = {
                    k: _from_numpy_record(
                        npz[k], self.meta["param_dtypes"][k],
                        self.meta["param_shapes"][k])
                    for k in npz.files
                }
        if self.meta["artifact_version"] > ARTIFACT_VERSION:
            raise RuntimeError(
                f"artifact version {self.meta['artifact_version']} is newer "
                f"than this library supports ({ARTIFACT_VERSION})")
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise RuntimeError(
                f"artifact was exported for platforms "
                f"{self.meta['platforms']} but this host's backend is "
                f"{backend!r} — re-export with platforms=('{backend}',)")
        self._exported = jax_export.deserialize(blob)
        self.batch_size = int(self.meta["batch_size"])
        self.num_classes = int(self.meta["num_classes"])
        self._cdtype = (jnp.bfloat16 if self.meta["dtype"] == "bfloat16"
                        else jnp.float32)
        self._setup_placements()
        self._device_params = self._commit_params(self.params)
        from gaviko_tpu.data.transforms import eval_transform

        self._transform = eval_transform
        mesh = self.meta.get("mesh_shape")
        logging.info(
            f"DeployedPredictor ready: {path} (batch {self.batch_size}, "
            f"{self.meta['dtype']}, platforms {self.meta['platforms']}"
            + (f", mesh data={mesh[0]} x tp={mesh[1]}" if mesh else "") + ")")

    def _setup_placements(self) -> None:
        """Derive per-leaf device placements from the exported module.

        The module records one sharding per flattened input (params in
        jax's dict-flatten order — sorted keys — then the volume batch).
        For mesh artifacts we rebuild a same-shape mesh over the first
        ``nr_devices`` local devices and let ``Exported.in_shardings_jax``
        map each recorded sharding onto it (no partition-rule code runs —
        the placements come from the module itself); single-device
        artifacts place everything on device 0.
        """
        jax = self._jax
        n = int(self._exported.nr_devices)
        if len(jax.devices()) < n:
            raise RuntimeError(
                f"artifact needs {n} devices (mesh "
                f"{self.meta.get('mesh_shape')}) but this host has "
                f"{len(jax.devices())}")
        devices = tuple(jax.devices()[:n])
        self._device0 = devices[0]
        if n == 1:
            self._param_shardings = None
            self._batch_sharding = jax.sharding.SingleDeviceSharding(
                devices[0])
            return
        from gaviko_tpu.parallel.mesh import make_mesh

        data_ax, tp = self.meta["mesh_shape"]
        mesh = make_mesh(data=data_ax, model=tp, devices=devices)
        flat_keys = sorted(self.params)
        shardings = self._exported.in_shardings_jax(mesh)
        if len(shardings) != len(flat_keys) + 1:
            raise RuntimeError(
                f"artifact records {len(shardings)} input shardings for "
                f"{len(flat_keys) + 1} inputs — params/manifest mismatch")
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        self._param_shardings = {
            k: (s if s is not None else rep)
            for k, s in zip(flat_keys, shardings[:-1])
        }
        self._batch_sharding = (
            shardings[-1] if shardings[-1] is not None else rep)

    def _commit_params(self, host_params: dict) -> dict:
        """Transfer host params to their device placements (once per load)."""
        jax = self._jax
        if self._param_shardings is None:
            dev = self._device0
            return {k: jax.device_put(v, dev) for k, v in host_params.items()}
        return {
            k: jax.device_put(v, self._param_shardings[k])
            for k, v in host_params.items()
        }

    def reload_checkpoint(self, checkpoint: Optional[str]) -> None:
        """Overlay a trainable-only ``.pt`` checkpoint onto the artifact's
        weights (atomic swap, same semantics as Predictor). ``None`` restores
        nothing — unlike Predictor there is no model rebuild path, so a
        checkpoint is required."""
        if checkpoint is None:
            raise ValueError(
                "DeployedPredictor.reload_checkpoint requires a checkpoint "
                "path (the artifact has no rebuild-from-config path)")
        from gaviko_tpu.weights.torch_io import load_checkpoint

        state = load_checkpoint(checkpoint)
        params = dict(self.params)
        unknown = [k for k in state if k not in params]
        if unknown:
            raise KeyError(
                f"checkpoint keys not in the artifact's params (first 5): "
                f"{unknown[:5]}")
        for k, v in state.items():
            ref = params[k]
            if tuple(v.shape) != tuple(ref.shape):
                raise ValueError(
                    f"shape mismatch for {k!r}: checkpoint {v.shape} vs "
                    f"artifact {ref.shape}")
            params[k] = np.asarray(v).astype(ref.dtype)
            sidecar = k + "::int8"
            if sidecar in params:  # keep quantized GEMM sidecars fresh
                from gaviko_tpu.ops.int8_linear import quantize_weight

                w_i8, scale = quantize_weight(self._jnp.asarray(params[k]))
                params[sidecar] = np.asarray(w_i8)
                params[k + "::int8_scale"] = np.asarray(scale)
        device_params = self._commit_params(params)
        # Atomic swap of BOTH views; in-flight predicts finish on the old
        # snapshot they captured at entry.
        self.params = params
        self._device_params = device_params
        logging.info(f"DeployedPredictor reloaded {checkpoint!r}")

    def predict_logits(self, volumes: Sequence[np.ndarray]) -> np.ndarray:
        """volumes: list of (D, H, W) or (C, D, H, W) arrays -> [n, classes]."""
        jax, jnp = self._jax, self._jnp
        params = self._device_params  # snapshot: reload can't mix chunks
        vols = [
            self._transform(v if v.ndim == 4 else np.expand_dims(v, 0))
            for v in volumes
        ]
        outs = []
        for i in range(0, len(vols), self.batch_size):
            chunk = vols[i: i + self.batch_size]
            n = len(chunk)
            if n < self.batch_size:
                chunk = chunk + [np.zeros_like(chunk[0])] * (self.batch_size - n)
            batch = jax.device_put(
                np.stack(chunk), self._batch_sharding
            ).astype(self._cdtype)
            logits = np.asarray(self._exported.call(params, batch))
            outs.append(logits[:n])
        return (np.concatenate(outs, axis=0) if outs
                else np.zeros((0, self.num_classes), np.float32))

    def predict(self, volumes: Sequence[np.ndarray]) -> np.ndarray:
        return self.predict_logits(volumes).argmax(axis=-1)
