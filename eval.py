"""Evaluation entry point — same contract as the reference's src/eval.py:

    python eval.py --config <yaml> --method <m> --checkpoint <ckpt> --results_dir <dir>

Thin shim over :mod:`gaviko_tpu.cli.evaluate` (installed as ``gaviko-eval``).
"""

from gaviko_tpu.cli.evaluate import evaluate, main, versioned_path  # noqa: F401

if __name__ == "__main__":
    main()
