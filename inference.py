"""Folder inference entry point — same contract as the reference's src/inference.py:

    python inference.py --config <yaml> --method <m> --checkpoint <ckpt> --results_dir <dir>

Thin shim over :mod:`gaviko_tpu.cli.infer` (installed as ``gaviko-infer``).
"""

from gaviko_tpu.cli.infer import inference, main  # noqa: F401

if __name__ == "__main__":
    main()
