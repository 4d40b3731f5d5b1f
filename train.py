"""Training entry point — same public contract as the reference's src/train.py:

    python train.py --config <yaml> --method <m> --results_dir <dir>

Thin shim over :mod:`gaviko_tpu.cli.train` (installed as ``gaviko-train``).
"""

from gaviko_tpu.cli.train import main, make_loaders, train  # noqa: F401

if __name__ == "__main__":
    main()
