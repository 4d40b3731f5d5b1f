"""Serving entry point: AOT-compiled model behind a local HTTP endpoint.

    python serve.py --config <yaml> --method <m> --checkpoint <ckpt> --port 8477

POST an .npz body (key ``data``, shape (D, H, W)) to /predict; GET /healthz.
"""

from __future__ import annotations

import argparse
import logging

from gaviko_tpu.config import METHODS, apply_method_override, load_config
from gaviko_tpu.serving import Predictor, serve
from gaviko_tpu.utils.logging import setup_logging
from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: repeat runs skip the relay compile


def _parse_mesh(parser, mesh: str | None):
    """--mesh "data,tp" -> (data, tp) with arity/value checks at parse time
    (a malformed value otherwise surfaces minutes later as an unrelated
    TypeError deep inside Predictor, after model build + checkpoint load)."""
    if not mesh:
        return None
    try:
        parts = tuple(int(x) for x in mesh.split(","))
    except ValueError:
        parser.error(f"--mesh must be two integers 'data,tp', got {mesh!r}")
    if len(parts) != 2 or any(p < 1 for p in parts):
        parser.error(f"--mesh must be two positive integers 'data,tp', got {mesh!r}")
    return parts


def main():
    parser = argparse.ArgumentParser(description="Serve a gaviko-tpu model")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--artifact", type=str, default=None,
                        help="serve a deployment artifact (gaviko-export "
                             "output) instead of building from --config")
    parser.add_argument("--method", type=str, default="gaviko", choices=list(METHODS))
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8477)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="opt-in w8a8 backbone GEMMs (serving only)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="mesh-parallel inference 'data,tp' (e.g. 2,4)")
    parser.add_argument("--auth_token", type=str, default=None,
                        help="require 'Authorization: Bearer <token>' on POSTs")
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="restrict /reload to checkpoints under this dir")
    parser.add_argument("--max_body_mb", type=int, default=128,
                        help="reject POST bodies above this size")
    args = parser.parse_args()

    if (args.config is None) == (args.artifact is None):
        parser.error("exactly one of --config or --artifact is required")
    if args.artifact is not None:
        from gaviko_tpu.deploy import DeployedPredictor

        for flag in ("checkpoint", "quantize", "mesh"):
            if getattr(args, flag) is not None:
                parser.error(f"--{flag} is baked into the artifact at "
                             "export time; not accepted with --artifact")
        setup_logging(log_dir="./log")
        predictor = DeployedPredictor(args.artifact)
    else:
        config = load_config(args.config)
        apply_method_override(config, args.method)
        setup_logging(log_dir=config["utils"]["log_dir"])
        predictor = Predictor(
            config, checkpoint=args.checkpoint, batch_size=args.batch_size,
            dtype=args.dtype,
            pretrained_dir=config["model"].get(
                "pretrained_dir", "./pretrained"),
            quantize=args.quantize,
            mesh_shape=_parse_mesh(parser, args.mesh),
        )
    serve(
        predictor, host=args.host, port=args.port,
        auth_token=args.auth_token, checkpoint_dir=args.checkpoint_dir,
        max_body_bytes=args.max_body_mb * 1024 * 1024,
    ).serve_forever()


if __name__ == "__main__":
    main()
