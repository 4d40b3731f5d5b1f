"""Developer perf probe: decompose the vit-b16 bf16 forward on the real chip.

Each component is timed with the chained-iteration methodology from bench.py
(data dependence between iterations, one scalar readback) because the axon
relay adds ~25 ms per dispatch and block_until_ready does not sync through
it. Not part of the test suite; run manually:

    python scripts/perf_probe.py [full|attn|mlp|qkv|patchify] ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B, N_PAD, DIM, HEADS, DH, MLP = 32, 1008, 768, 12, 64, 3072
ITERS = 20


def timeit(jitted, *args):
    import jax

    float(jitted(*args))
    t0 = time.time()
    float(jitted(*args))
    return (time.time() - t0) / ITERS * 1000  # ms per iteration


def probe_full():
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
        lambda t: t.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), model.spec),
    )
    vol = jnp.asarray(np.random.RandomState(0).rand(B, 1, 120, 160, 160)
                      ).astype(jnp.bfloat16)

    def chain(params, x):
        # Light carry (patch-embed bias: operand of the first Pallas call, so
        # nothing is loop-invariant); avoids the old full-volume add
        # (~0.5 ms/iter instrument overhead at B32).
        def body(i, c):
            out = model.apply({**params, "conv_proj.0.bias": c}, x, model.spec)
            return c + out[0, 0].astype(c.dtype) * jnp.asarray(1e-30, c.dtype)
        return jax.lax.fori_loop(0, ITERS, body, params["conv_proj.0.bias"])[0]

    ms = timeit(jax.jit(chain), params, vol)
    print(f"full forward: {ms:.2f} ms/batch ({B / ms * 1000:.1f} vol/s)")


def probe_attn():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.ops.flash_attention import fused_mhsa

    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N_PAD, 3 * HEADS * DH)).astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    def chain(qkv):
        def body(i, qkv):
            out = fused_mhsa(qkv, seed, HEADS, DH, DH ** -0.5, 1001, 0.0)
            return qkv + out[0, 0, 0].astype(qkv.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, ITERS, body, qkv)[0, 0, 0]

    ms = timeit(jax.jit(chain), qkv)
    print(f"fused_mhsa: {ms:.2f} ms/call -> x12 = {12 * ms:.1f} ms")


def probe_mlp():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.ops.fused_mlp import fused_mlp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N_PAD, DIM)).astype(jnp.bfloat16)
    gamma = jnp.ones((DIM,), jnp.bfloat16)
    beta = jnp.zeros((DIM,), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(DIM, MLP) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((MLP,), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(MLP, DIM) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((DIM,), jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    def chain(x):
        def body(i, x):
            out = fused_mlp(x, gamma, beta, w1, b1, w2, b2, seed, 1e-5, True, 0.0)
            return x + out[0, 0, 0].astype(x.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, ITERS, body, x)[0, 0, 0]

    ms = timeit(jax.jit(chain), x)
    print(f"fused_mlp: {ms:.2f} ms/call -> x12 = {12 * ms:.1f} ms")


def probe_qkv():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N_PAD, DIM)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3 * HEADS * DH, DIM) * 0.02).astype(jnp.bfloat16)
    wo = jnp.asarray(rng.randn(DIM, HEADS * DH) * 0.02).astype(jnp.bfloat16)

    def chain(x):
        def body(i, x):
            qkv = x @ w.T
            out = qkv[..., : HEADS * DH] @ wo.T
            return x + out[0, 0, 0].astype(x.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, ITERS, body, x)[0, 0, 0]

    ms = timeit(jax.jit(chain), x)
    print(f"qkv GEMM + out-proj: {ms:.2f} ms/call -> x12 = {12 * ms:.1f} ms")


def probe_patchify():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.config import make_spec
    from gaviko_tpu.core.vit import patchify_embed

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft",
    )
    spec = make_spec(cfg)
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(B, 1, 120, 160, 160)).astype(jnp.bfloat16)
    p = {
        "conv_proj.0.weight": jnp.asarray(
            rng.randn(DIM, 1, 12, 16, 16) * 0.02).astype(jnp.bfloat16),
        "conv_proj.0.bias": jnp.zeros((DIM,), jnp.bfloat16),
    }

    def chain(vol):
        def body(i, vol):
            out = patchify_embed(p, "conv_proj.0", vol, spec)
            return vol + out[0, 0, 0].astype(vol.dtype) * jnp.bfloat16(1e-30)
        return jax.lax.fori_loop(0, ITERS, body, vol)[0, 0, 0, 0, 0]

    ms = timeit(jax.jit(chain), vol)
    print(f"patchify: {ms:.2f} ms/call")


def _block_inputs():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N_PAD, DIM)).astype(jnp.bfloat16)
    gamma = jnp.ones((DIM,), jnp.bfloat16)
    beta = jnp.zeros((DIM,), jnp.bfloat16)
    wqkv_t = jnp.asarray(rng.randn(DIM, 3 * DIM) * 0.02).astype(jnp.bfloat16)
    wo_t = jnp.asarray(rng.randn(DIM, DIM) * 0.02).astype(jnp.bfloat16)
    bo = jnp.zeros((DIM,), jnp.bfloat16)
    return x, gamma, beta, wqkv_t, wo_t, bo


def probe_composed():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.ops.flash_attention import fused_mhsa

    x, gamma, beta, wqkv_t, wo_t, bo = _block_inputs()
    seed = jnp.zeros((1,), jnp.int32)

    def block(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        h = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        h = h * gamma + beta
        qkv = h @ wqkv_t
        out = fused_mhsa(qkv, seed, HEADS, DH, DH ** -0.5, 1001, 0.0)
        return x + (out @ wo_t + bo)

    def chain(x):
        def body(i, x):
            return block(x) * jnp.bfloat16(1.0)
        return jax.lax.fori_loop(0, ITERS, body, x)[0, 0, 0]

    ms = timeit(jax.jit(chain), x)
    print(f"composed attn block: {ms:.2f} ms/call -> x12 = {12 * ms:.1f} ms")


def probe_attn_bwd():
    """Attention fwd+bwd at the TRAIN geometry (B8, dropout 0.1) across
    GAVIKO_BWD_HP head-pair widths. 2/4/6 measured a tie at the composed
    qkv+attn level (ARCHITECTURE.md); this isolates the MHSA kernel pair
    so smaller deltas are visible. Usage:
        GAVIKO_BWD_HP=12 python scripts/perf_probe.py attn_bwd
    """
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.ops.flash_attention import fused_mhsa

    b = 8
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(b, N_PAD, 3 * HEADS * DH)).astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)
    hp = os.environ.get("GAVIKO_BWD_HP", "2")

    def loss(qkv):
        out = fused_mhsa(qkv, seed, HEADS, DH, DH ** -0.5, 1001, 0.1)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)

    def chain(qkv):
        def body(i, carry):
            g = jax.grad(loss)(qkv + carry * jnp.bfloat16(1e-30))
            return carry + g[0, 0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))

    ms = timeit(jax.jit(chain), qkv)
    print(f"attn fwd+bwd [hp={hp}] B{b}: {ms:.3f} ms/layer -> x12 = "
          f"{12 * ms:.1f} ms")


def _train_setup():
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), model.spec)
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(8, 1, 120, 160, 160).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, size=8).astype(np.int32))
    return model, params, vol, labels


def probe_train():
    """Decompose the B8 train step: fwd / fwd+bwd / +optimizer, dropout on/off."""
    import jax
    import jax.numpy as jnp
    import optax

    from gaviko_tpu.train.losses import focal_loss

    model, params, vol, labels = _train_setup()
    key = jax.random.PRNGKey(1)

    def make_loss(dropout_on):
        def loss_fn(p, step_rng):
            pc = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, p)
            logits = model.apply(pc, vol.astype(jnp.bfloat16), model.spec,
                                 train=dropout_on, rng=step_rng)
            return focal_loss(logits.astype(jnp.float32), labels, gamma=1.2)
        return loss_fn

    for name, dropout_on in (("drop", True), ("nodrop", False)):
        loss_fn = make_loss(dropout_on)

        # The accumulator perturbs ONE param leaf so the body can never be
        # hoisted as loop-invariant (in the nodrop case the rng is unused
        # and XLA would otherwise hoist the whole forward out of the loop).
        def perturb(p, acc):
            q = dict(p)
            q["cls_token"] = p["cls_token"] + acc * 1e-30
            return q

        def fwd_chain(p):
            def body(i, acc):
                return acc + loss_fn(perturb(p, acc), jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        ms = timeit(jax.jit(fwd_chain), params)
        print(f"fwd only [{name}]: {ms:.2f} ms ({8 / ms * 1000:.1f} vol/s)")

        def grad_chain(p):
            def body(i, carry):
                g = jax.grad(lambda q, r: loss_fn(q, r))(
                    perturb(p, carry), jax.random.fold_in(key, i))
                return carry + jax.tree.leaves(g)[0].reshape(-1)[0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        ms = timeit(jax.jit(grad_chain), params)
        print(f"fwd+bwd [{name}]: {ms:.2f} ms ({8 / ms * 1000:.1f} vol/s)")

    # Full step (= bench) and optimizer-only delta.
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt_state = tx.init(params)
    loss_fn = make_loss(True)

    def step_chain(p, o):
        def body(i, carry):
            p, o = carry
            grads = jax.grad(loss_fn)(p, jax.random.fold_in(key, i))
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o
        p, _ = jax.lax.fori_loop(0, ITERS, body, (p, o))
        return jax.tree.leaves(p)[0].reshape(-1)[0]

    ms = timeit(jax.jit(step_chain), params, opt_state)
    print(f"full step [drop]: {ms:.2f} ms ({8 / ms * 1000:.1f} vol/s)")


def probe_train_depth():
    """fwd and fwd+bwd at depths 2/7/12: slope = true per-layer cost,
    intercept = patchify + embed + head + loss + glue (the chained
    per-component probes are latency-confounded; this sweep is not)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gaviko_tpu.train.losses import focal_loss

    model, params, vol, labels = _train_setup()
    key = jax.random.PRNGKey(1)
    volb = vol.astype(jnp.bfloat16)
    results = {}
    for k in (2, 7, 12):
        spec_k = dataclasses.replace(model.spec, depth=k)
        params_k = {
            n: t for n, t in model.init(jax.random.PRNGKey(0), spec_k).items()
        }

        def loss_fn(p, step_rng):
            pc = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, p)
            logits = model.apply(pc, volb, spec_k, train=True, rng=step_rng)
            return focal_loss(logits.astype(jnp.float32), labels, gamma=1.2)

        def perturb(p, acc):
            q = dict(p)
            q["cls_token"] = p["cls_token"] + acc * 1e-30
            return q

        def fwd_chain(p):
            def body(i, acc):
                return acc + loss_fn(perturb(p, acc), jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        def grad_chain(p):
            def body(i, carry):
                g = jax.grad(loss_fn)(perturb(p, carry),
                                      jax.random.fold_in(key, i))
                return carry + jax.tree.leaves(g)[0].reshape(-1)[0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        f = timeit(jax.jit(fwd_chain), params_k)
        fb = timeit(jax.jit(grad_chain), params_k)
        results[k] = (f, fb)
        print(f"depth {k:2d}: fwd {f:.2f} ms  fwd+bwd {fb:.2f} ms")
    (f2, fb2), (f12, fb12) = results[2], results[12]
    print(f"per-layer: fwd {(f12 - f2) / 10:.3f} ms  "
          f"fwd+bwd {(fb12 - fb2) / 10:.3f} ms")
    print(f"intercept (depth-0 extrapolated): fwd {f2 - (f12 - f2) / 5:.2f} ms"
          f"  fwd+bwd {fb2 - (fb12 - fb2) / 5:.2f} ms")


def probe_train_layers():
    """Per-component fwd+bwd at the B8 train geometry (N=1008, bf16)."""
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.ops.flash_attention import fused_mhsa
    from gaviko_tpu.ops.fused_mlp import fused_mlp

    Bt = 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(Bt, N_PAD, DIM)).astype(jnp.bfloat16)
    seed = jnp.ones((1,), jnp.int32)
    wqkv = jnp.asarray(rng.randn(3 * DIM, DIM) * 0.02).astype(jnp.bfloat16)
    gamma = jnp.ones((DIM,), jnp.bfloat16)
    beta = jnp.zeros((DIM,), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(MLP, DIM) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((MLP,), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(DIM, MLP) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((DIM,), jnp.bfloat16)

    for drop in (0.0, 0.1):
        def attn_f(x):
            qkv = x @ wqkv.T
            o = fused_mhsa(qkv, seed, HEADS, DH, DH ** -0.5, 1001, drop)
            return jnp.sum(o.astype(jnp.float32) * x.astype(jnp.float32))

        def attn_chain(x):
            def body(i, acc):
                return acc + jax.grad(lambda t: attn_f(t + acc.astype(
                    jnp.bfloat16) * jnp.bfloat16(1e-30)))(x)[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        ms = timeit(jax.jit(attn_chain), x)
        print(f"qkv+attn fwd+bwd [drop={drop}]: {ms:.2f} ms/layer "
              f"-> x12 = {12 * ms:.1f} ms")

        def mlp_f(x):
            o = fused_mlp(x, gamma, beta, w1, b1, w2, b2, seed, 1e-5, True,
                          drop, True)
            return jnp.sum(o.astype(jnp.float32) * x.astype(jnp.float32))

        def mlp_chain(x):
            def body(i, acc):
                return acc + jax.grad(lambda t: mlp_f(t + acc.astype(
                    jnp.bfloat16) * jnp.bfloat16(1e-30)))(x)[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        ms = timeit(jax.jit(mlp_chain), x)
        print(f"mlp fwd+bwd [drop={drop}]: {ms:.2f} ms/layer "
              f"-> x12 = {12 * ms:.1f} ms")


def probe_optimizer():
    """Adam + global-norm clip over the vit-b16 fp32 param tree (no model)."""
    import jax
    import jax.numpy as jnp
    import optax

    model, params, _, _ = _train_setup()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda t: jnp.full_like(t, 1e-4), params)

    def chain(p, o, g):
        def body(i, carry):
            p, o = carry
            gi = jax.tree.map(lambda t, q: t + q.reshape(-1)[0] * 1e-30, g, p)
            updates, o = tx.update(gi, o, p)
            return optax.apply_updates(p, updates), o
        p, _ = jax.lax.fori_loop(0, ITERS, body, (p, o))
        return jax.tree.leaves(p)[0].reshape(-1)[0]

    ms = timeit(jax.jit(chain), params, opt_state, grads)
    print(f"clip+adam only: {ms:.2f} ms/step")


def probe_int8():
    """w8a8 serving mode vs bf16: vit-b16 B32 eval forward, the bench chain.
    Also prints the quality delta (relative logit MAE int8 vs bf16)."""
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.ops.int8_linear import quantize_backbone

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), model.spec))
    vol = jnp.asarray(np.random.RandomState(0).rand(B, 1, 120, 160, 160)
                      ).astype(jnp.bfloat16)

    def make_chain(p):
        def chain(p, x):
            def body(i, c):
                out = model.apply({**p, "conv_proj.0.bias": c}, x, model.spec)
                return c + out[0, 0].astype(c.dtype) * jnp.asarray(
                    1e-30, c.dtype)
            return jax.lax.fori_loop(0, ITERS, body, p["conv_proj.0.bias"])[0]
        return chain

    logits = {}
    for name, p in (("bf16", params),
                    ("int8", quantize_backbone(params, model.spec.depth))):
        ms = timeit(jax.jit(make_chain(p)), p, vol)
        print(f"infer B{B} [{name}]: {ms:.2f} ms ({B / ms * 1000:.1f} vol/s)")
        logits[name] = np.asarray(jax.jit(
            lambda p, x: model.apply(p, x, model.spec))(p, vol),
            dtype=np.float64)
    mae = np.mean(np.abs(logits["int8"] - logits["bf16"]))
    rel = mae / np.mean(np.abs(logits["bf16"]))
    agree = (logits["int8"].argmax(1) == logits["bf16"].argmax(1)).mean()
    print(f"int8 vs bf16: rel logit MAE {rel:.4f}, argmax agreement {agree:.3f}")


def probe_int8_gaviko():
    """w8a8 on the GAViKO vit-l16 flagship (B8): backbone GEMMs quantize;
    local attention / prompt projections stay bf16 (no int8 consumer)."""
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.ops.int8_linear import quantize_backbone

    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-l16",
        method="gaviko", freeze_vit=True, num_prompts=32,
        prompt_latent_dim=20, local_dim=20, local_k=[6, 6, 6],
        DHW=[10, 10, 10], attn_drop=0.2, proj_drop=0.2, share_factor=1,
        dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), model.spec))
    GB = 8
    vol = jnp.asarray(np.random.RandomState(0).rand(GB, 1, 120, 160, 160)
                      ).astype(jnp.bfloat16)

    def make_chain(p):
        def chain(p, x):
            def body(i, c):
                out = model.apply({**p, "conv_proj.0.bias": c}, x, model.spec)
                return c + out[0, 0].astype(c.dtype) * jnp.asarray(
                    1e-30, c.dtype)
            return jax.lax.fori_loop(0, ITERS, body, p["conv_proj.0.bias"])[0]
        return chain

    logits = {}
    for name, p in (("bf16", params),
                    ("int8", quantize_backbone(params, model.spec.depth))):
        ms = timeit(jax.jit(make_chain(p)), p, vol)
        print(f"gaviko-l16 B{GB} [{name}]: {ms:.2f} ms "
              f"({GB / ms * 1000:.1f} vol/s)")
        logits[name] = np.asarray(jax.jit(
            lambda p, x: model.apply(p, x, model.spec))(p, vol),
            dtype=np.float64)
    mae = np.mean(np.abs(logits["int8"] - logits["bf16"]))
    rel = mae / np.mean(np.abs(logits["bf16"]))
    agree = (logits["int8"].argmax(1) == logits["bf16"].argmax(1)).mean()
    print(f"int8 vs bf16: rel logit MAE {rel:.4f}, argmax agreement {agree:.3f}")


def probe_batch_sweep():
    """Per-volume inference throughput vs batch size (vit-b16 bf16).

    The north-star metric is volumes/sec/chip with no mandated batch size —
    B32 was self-chosen in round 1. Larger batches amortize per-kernel
    dispatch tails and grid remainders; this sweeps B and reports vol/s so
    the headline batch can be chosen from measurement. Sweep with
    GAVIKO_KPAD128=1 (fast Mosaic compile per new geometry), then re-verify
    the winner with the default exact-stripe patchify.
    """
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model

    batches = [int(b) for b in (sys.argv[2:] or [32, 48, 64])]
    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), model.spec),
    )
    for b in batches:
        vol = jnp.asarray(np.random.RandomState(0).rand(b, 1, 120, 160, 160)
                          ).astype(jnp.bfloat16)

        def chain(params, x):
            def body(i, c):
                out = model.apply({**params, "conv_proj.0.bias": c}, x,
                                  model.spec)
                return c + out[0, 0].astype(c.dtype) * jnp.asarray(
                    1e-30, c.dtype)
            return jax.lax.fori_loop(
                0, ITERS, body, params["conv_proj.0.bias"])[0]

        ms = timeit(jax.jit(chain), params, vol)
        print(f"B{b}: {ms:.2f} ms/batch ({b / ms * 1000:.1f} vol/s)")


def probe_train_batch_sweep():
    """Train-step throughput vs batch size (bench-exact chain: pure bf16,
    fused clip+Adam, dropout on).

    The optimizer pass (~2.1 ms) and per-kernel dispatch tails are batch-
    independent, so larger batches should amortize them; attention/MLP FLOPs
    scale linearly. Reports vol/s per B so a max-throughput production train
    batch can be chosen from measurement (the B8 bench figure mirrors the
    reference's batch size, which was a GPU-memory choice, not a throughput
    one). Sweep with GAVIKO_KPAD128=1 first (fast Mosaic compile per new
    geometry), re-verify the winner on the default exact stripes.
    """
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.train import fused_optim
    from gaviko_tpu.train.losses import focal_loss

    batches = [int(b) for b in (sys.argv[2:] or [8, 16, 32])]
    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-b16",
        method="fft", dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), model.spec),
    )
    opt_state = fused_optim.init(params)
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(0)
    for b in batches:
        vol = jnp.asarray(rng.rand(b, 1, 120, 160, 160)).astype(jnp.bfloat16)
        labels = jnp.asarray(rng.randint(0, 5, size=b).astype(np.int32))

        def loss_fn(p, step_rng):
            logits = model.apply(p, vol, model.spec, train=True, rng=step_rng)
            return focal_loss(logits.astype(jnp.float32), labels, gamma=1.2)

        def chain(params, opt_state):
            def body(i, carry):
                p, o = carry
                grads = jax.grad(loss_fn)(p, jax.random.fold_in(key, i))
                return fused_optim.step(grads, o, p, 3e-4, clip=1.0, eps=1e-4)
            p, _ = jax.lax.fori_loop(0, ITERS, body, (params, opt_state))
            return jax.tree.leaves(p)[0].astype(jnp.float32).reshape(-1)[0]

        ms = timeit(jax.jit(chain), params, opt_state)
        print(f"B{b}: {ms:.2f} ms/step ({b / ms * 1000:.1f} vol/s)")


def probe_train_gaviko():
    """GAViKO vit-l16 PEFT train step (the reference's flagship training
    workload: gaviko.yaml trains GAViKO on a frozen vit-l16 backbone at
    batch 4). Frozen params take no grads/optimizer state — the torch
    analog of requires_grad=False. Sweeps batch sizes from argv (default
    4 8)."""
    import jax
    import jax.numpy as jnp

    from gaviko_tpu.models.factory import build_model
    from gaviko_tpu.train import fused_optim
    from gaviko_tpu.train.loop import split_params
    from gaviko_tpu.train.losses import focal_loss

    batches = [int(b) for b in (sys.argv[2:] or [4, 8])]
    cfg = dict(
        image_size=160, image_patch_size=16, frames=120, frame_patch_size=12,
        num_classes=5, channels=1, pool="cls", backbone="vit-l16",
        method="gaviko", freeze_vit=True, num_prompts=32,
        prompt_latent_dim=20, local_dim=20, local_k=[6, 6, 6],
        DHW=[10, 10, 10], attn_drop=0.2, proj_drop=0.2, share_factor=1,
        dropout=0.1, emb_dropout=0.1, gelu="tanh",
    )
    model = build_model(cfg)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), model.spec),
    )
    trainable, frozen = split_params(model, params)
    print(f"trainable leaves: {len(trainable)}, frozen: {len(frozen)}")
    opt_state = fused_optim.init(trainable)
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(0)
    for b in batches:
        vol = jnp.asarray(rng.rand(b, 1, 120, 160, 160)).astype(jnp.bfloat16)
        labels = jnp.asarray(rng.randint(0, 5, size=b).astype(np.int32))

        def loss_fn(t, step_rng):
            logits = model.apply({**frozen, **t}, vol, model.spec,
                                 train=True, rng=step_rng)
            return focal_loss(logits.astype(jnp.float32), labels, gamma=1.2)

        def chain(trainable, opt_state):
            def body(i, carry):
                t, o = carry
                grads = jax.grad(loss_fn)(t, jax.random.fold_in(key, i))
                return fused_optim.step(grads, o, t, 3e-4, clip=1.0, eps=1e-4)
            t, _ = jax.lax.fori_loop(0, ITERS, body, (trainable, opt_state))
            return jax.tree.leaves(t)[0].astype(jnp.float32).reshape(-1)[0]

        ms = timeit(jax.jit(chain), trainable, opt_state)
        print(f"B{b}: {ms:.2f} ms/step ({b / ms * 1000:.1f} vol/s)")


PROBES = {
    "full": probe_full,
    "batch_sweep": probe_batch_sweep,
    "train_batch_sweep": probe_train_batch_sweep,
    "train_gaviko": probe_train_gaviko,
    "attn": probe_attn,
    "attn_bwd": probe_attn_bwd,
    "int8": probe_int8,
    "int8_gaviko": probe_int8_gaviko,
    "mlp": probe_mlp,
    "qkv": probe_qkv,
    "patchify": probe_patchify,
    "composed": probe_composed,
    "train": probe_train,
    "train_depth": probe_train_depth,
    "train_layers": probe_train_layers,
    "optimizer": probe_optimizer,
}

if __name__ == "__main__":
    # Numeric argv entries are probe parameters (e.g. batch_sweep's batch
    # list), not probe names.
    names = [a for a in sys.argv[1:] if not a.isdigit()] or list(PROBES)
    for name in names:
        PROBES[name]()
