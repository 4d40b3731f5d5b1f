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


def main():
    parser = argparse.ArgumentParser(description="Serve a gaviko-tpu model")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--method", type=str, default="gaviko", choices=list(METHODS))
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8477)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    args = parser.parse_args()

    config = load_config(args.config)
    apply_method_override(config, args.method)
    setup_logging(log_dir=config["utils"]["log_dir"])
    predictor = Predictor(
        config, checkpoint=args.checkpoint, batch_size=args.batch_size,
        dtype=args.dtype,
        pretrained_dir=config["model"].get("pretrained_dir", "./pretrained"),
    )
    serve(predictor, host=args.host, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
