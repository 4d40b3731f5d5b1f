"""Export a model to a self-contained AOT deployment artifact.

    python export.py --config <yaml> --method <m> --checkpoint <ckpt> \
        --output model.gaviko [--platforms tpu] [--quantize int8]

The artifact (a zip: serialized jax.export module + weights + manifest)
serves without model-building code: ``serve.py --artifact model.gaviko``.
See :mod:`gaviko_tpu.deploy` for format and guarantees.
"""

from __future__ import annotations

import argparse

from gaviko_tpu.config import METHODS, apply_method_override, load_config
from gaviko_tpu.deploy import export_artifact
from gaviko_tpu.utils.logging import setup_logging
from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    parser = argparse.ArgumentParser(
        description="Export a gaviko-tpu model to a deployment artifact")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--method", type=str, default="gaviko",
                        choices=list(METHODS))
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="trainable-only checkpoint to bake in")
    parser.add_argument("--output", type=str, required=True,
                        help="artifact path (e.g. model.gaviko)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"])
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated lowering targets (e.g. 'tpu' "
                             "or 'tpu,cpu'); default: this host's backend")
    parser.add_argument("--mesh", type=str, default=None,
                        help="'data,tp' — bake a mesh-parallel forward "
                             "(GSPMD shardings) into the artifact; serving "
                             "then needs data*tp devices")
    args = parser.parse_args()

    mesh_shape = None
    if args.mesh is not None:
        try:
            d, t = (int(x) for x in args.mesh.split(","))
            mesh_shape = (d, t)
        except ValueError:
            parser.error("--mesh must be 'data,tp' (two integers)")

    config = load_config(args.config)
    apply_method_override(config, args.method)
    setup_logging(log_dir=config["utils"]["log_dir"])
    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    meta = export_artifact(
        config, args.output, checkpoint=args.checkpoint,
        batch_size=args.batch_size, dtype=args.dtype,
        pretrained_dir=config["model"].get("pretrained_dir", "./pretrained"),
        quantize=args.quantize, platforms=platforms, mesh_shape=mesh_shape,
    )
    print(f"wrote {args.output} (platforms={meta['platforms']}, "
          f"batch={meta['batch_size']}, dtype={meta['dtype']})")


if __name__ == "__main__":
    main()
