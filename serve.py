"""Serving entry point: AOT-compiled model behind a local HTTP endpoint.

    python serve.py --config <yaml> --method <m> --checkpoint <ckpt> --port 8477

Thin shim over :mod:`gaviko_tpu.cli.serve` (installed as ``gaviko-serve``).
POST an .npz body (key ``data``, shape (D, H, W)) to /predict; GET /healthz.
"""

from gaviko_tpu.cli.serve import main  # noqa: F401

if __name__ == "__main__":
    main()
