"""Capture a device-timeline trace of the bench train step / inference fwd.

Runs ONE warm dispatch under jax.profiler (the chained-iteration bench
methodology is for TIMING; per-op attribution wants a single step), then
prints the per-op summary via scripts/xplane.py.

    python scripts/trace_step.py train|infer|gaviko_train [trace_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def build_train_step(batch: int = 8):
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.train import fused_optim
    from gaviko_tpu.train.losses import focal_loss

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
        model.init(jax.random.PRNGKey(0), model.spec))
    opt_state = fused_optim.init(params)
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(batch, 1, 120, 160, 160)).astype(jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 5, size=batch).astype(np.int32))
    key = jax.random.PRNGKey(1)

    def loss_fn(p, step_rng):
        logits = model.apply(p, vol, model.spec, train=True, rng=step_rng)
        return focal_loss(logits.astype(jnp.float32), labels, gamma=1.2)

    import functools

    # Donate params/opt state like the bench chain's fori_loop carry does —
    # otherwise the trace shows per-layer weight copies the real training
    # step never pays (observed: ~0.4 ms of copy-done on the weight leaves).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o):
        grads = jax.grad(loss_fn)(p, key)
        return fused_optim.step(grads, o, p, 3e-4, clip=1.0, eps=1e-4)

    state = {"p": params, "o": opt_state}

    def run():
        state["p"], state["o"] = step(state["p"], state["o"])
        jax.block_until_ready(jax.tree.leaves(state["p"])[0])

    return run


def build_gaviko_train_step():
    """Flagship PEFT step: GAViKO vit-l16 B4, frozen backbone, trainable
    head|prompt|local_attn — mirrors bench.bench_gaviko_l16_train."""
    import functools

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.train import fused_optim
    from gaviko_tpu.train.losses import focal_loss

    model = build_model(bench_mod._gaviko_cfg())
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
        model.init(jax.random.PRNGKey(0), model.spec))
    trainable = {k: v for k, v in params.items() if model.trainable(k)}
    frozen = {k: v for k, v in params.items() if not model.trainable(k)}
    opt_state = fused_optim.init(trainable)
    rng = np.random.RandomState(0)
    B = bench_mod.GAVIKO_TRAIN_BATCH
    vol = jnp.asarray(rng.rand(B, 1, 120, 160, 160)).astype(jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 5, size=B).astype(np.int32))
    key = jax.random.PRNGKey(1)

    def loss_fn(tr, fz, v, step_rng):
        logits = model.apply({**fz, **tr}, v, model.spec, train=True,
                             rng=step_rng)
        return focal_loss(logits.astype(jnp.float32), labels, gamma=1.2)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(tr, o, fz, v):
        grads = jax.grad(loss_fn)(tr, fz, v, key)
        return fused_optim.step(grads, o, tr, 3e-4, clip=1.0, eps=1e-4)

    state = {"t": trainable, "o": opt_state}

    def run():
        state["t"], state["o"] = step(state["t"], state["o"], frozen, vol)
        jax.block_until_ready(jax.tree.leaves(state["t"])[0])

    return run


def build_infer():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
        model.init(jax.random.PRNGKey(0), model.spec))
    vol = jnp.asarray(
        np.random.RandomState(0).rand(32, 1, 120, 160, 160)).astype(jnp.bfloat16)
    fn = jax.jit(lambda p, x: model.apply(p, x, model.spec))
    return lambda: jax.block_until_ready(fn(params, vol))


def main():
    import jax

    which = sys.argv[1] if len(sys.argv) > 1 else "train"
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_{which}"
    builders = {"train": build_train_step, "infer": build_infer,
                "train16": lambda: build_train_step(batch=16),
                "gaviko_train": build_gaviko_train_step}
    if which not in builders:
        sys.exit(f"usage: trace_step.py {'|'.join(builders)} [trace_dir]")
    run = builders[which]()
    run()  # compile + warm
    run()
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        run()
    jax.profiler.stop_trace()
    print(f"trace -> {trace_dir}", flush=True)
    from xplane import device_op_summary  # noqa: E402  (same dir)
    for pname, agg in device_op_summary(trace_dir).items():
        total = sum(agg.values())
        if total < 1e6:
            continue
        print(f"\n=== {pname}  (sum {total / 1e9 / 3:.3f} ms per dispatch over 3)")
        for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:48]:
            print(f"{ps / 1e9 / 3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    sys.path.append(os.path.dirname(os.path.abspath(__file__)))
    main()
