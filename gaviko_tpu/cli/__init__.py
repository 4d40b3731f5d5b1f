"""Console entry points (``gaviko-train`` / ``gaviko-eval`` / ``gaviko-infer`` /
``gaviko-serve``, see pyproject.toml).

The repo-root ``train.py`` / ``eval.py`` / ``inference.py`` / ``serve.py`` shims
re-export these modules so the reference's script-invocation contract
(``python train.py --config ... --method ...``, ref src/train.py:506-527)
keeps working from a checkout, while ``pip install`` users get proper console
scripts without generic top-level module names.
"""
