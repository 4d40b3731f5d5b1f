"""Export entry point: package a model into an AOT deployment artifact.

    python export.py --config <yaml> --method <m> --checkpoint <ckpt> \
        --output model.gaviko

Thin shim over :mod:`gaviko_tpu.cli.export` (installed as ``gaviko-export``).
Serve the result with ``python serve.py --artifact model.gaviko``.
"""

from gaviko_tpu.cli.export import main  # noqa: F401

if __name__ == "__main__":
    main()
