"""Runnable floor derivation for the vit-b16 fft train step (round-3
verdict #3: the "225 vol/s is below the single-chip floor" claim must be
independently checkable, not a doc assertion).

The floor is built from measured machine rates applied to the exact
GEMM/byte inventory of the workload — no model code is timed, so the
result is independent of our kernels:

1. **MXU GEMM classes.** Every training matmul falls into one of three
   contraction classes with very different sustained rates on v5e:
   - ``wide``  — K >= 768 weight GEMMs (qkv/proj/fc1/fc2/patchify and
     their dW/dx duals): near-peak MXU.
   - ``k64``   — attention dots contracting over dim_head=64 (S=QK^T,
     dP=dO V^T): the 64-deep contraction fills half the 128-lane MXU
     pipeline => caps at ~50% peak (hardware property, ride-along A/B in
     ARCHITECTURE.md).
   - ``kseq``  — attention dots contracting over the sequence (PV, dV,
     dQ, dK): full-depth contraction but 64-wide output.
   Each class rate is measured on an ISOLATED synthetic GEMM of the
   workload's own shape.

2. **VPU serial passes.** The fused-attention in-kernel lane reductions
   and exp do NOT overlap the MXU (A/B-confirmed: statement-reorder and
   ride-along row-sum probes in ARCHITECTURE.md measured zero overlap
   gain), so softmax fwd+bwd and GELU fwd+bwd are additive serial time.
   Measured with a VMEM-RESIDENT Pallas microbench (one block loaded
   once, the math repeated in-register/in-VMEM with a carry) — an
   HBM-materialized XLA softmax would measure memory bandwidth, not the
   VPU work the fused kernels actually pay.

3. **Optimizer HBM traffic.** The fused clip+Adam step is bandwidth-bound:
   7 bf16 arrays of nparams traffic (read p,g,m,v; write p,m,v) at the
   measured triad HBM rate.

Timing methodology: every rate is a SLOPE — the same chained computation
at two iteration counts, rate = d(time)/d(iters). The axon relay's ~25 ms
dispatch, warmup, and any loop-invariant work cancel exactly (a plain
chained measurement at micro-iteration cost halves apparent GEMM rates).

Everything smaller (LN, dropout hash, bias adds, patchify stripe copies,
residual adds, kernel ramp/drain) is EXCLUDED — the floor is therefore an
underestimate of true cost, which is the conservative direction for the
claim "the target is below the floor".

Usage (on the real chip):

    python scripts/train_floor.py [--record] [B ...]   # default: 8 16

Prints one JSON line per batch size with every term, the floor in ms, the
implied max vol/s, and the 225-target verdict; ``--record`` writes the
whole derivation to ``FLOOR.json`` at the repo root (the committed
per-round artifact). Reference workload:
/root/reference/src/train.py:266-319 (train step), configs vit.yaml B8.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

ITERS_LO, ITERS_HI = 40, 120
N_PAD = 1008          # 1000 patches + cls, tile-padded
DIM, HEADS, DH, MLP_DIM = 768, 12, 64, 3072
PATCH = 12 * 16 * 16  # 3072-element 3D patch
N_PATCHES = 1000
DEPTH = 12
N_PARAMS = 86_567_000  # vit-b16 fft trainable params (head incl.)


def _time_s(jitted, *args):
    float(jitted(*args))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(jitted(*args))
        best = min(best, time.time() - t0)
    return best


def _slope_ms(make_chain, *args):
    """ms per iteration from two chain lengths; dispatch and any
    loop-invariant work cancel in the difference."""
    import jax

    lo = jax.jit(make_chain(ITERS_LO))
    hi = jax.jit(make_chain(ITERS_HI))
    t_lo = _time_s(lo, *args)
    t_hi = _time_s(hi, *args)
    return max(t_hi - t_lo, 1e-9) * 1000.0 / (ITERS_HI - ITERS_LO)


def _gemm_rate_tfs(m, k, n, batch=1):
    """Sustained bf16 TF/s for a chained (batch of) [m,k]x[k,n] GEMM."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(batch, m, k)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(batch, k, n)).astype(jnp.bfloat16)

    def make_chain(iters):
        def chain(a, b):
            def body(i, c):
                out = jnp.einsum("bmk,bkn->bmn", a + c, b)
                return c + out[0, 0, 0] * jnp.asarray(1e-30, a.dtype)
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), a.dtype))
        return chain

    ms = _slope_ms(make_chain, a, b)
    flops = 2.0 * batch * m * k * n
    return flops / (ms * 1e-3) / 1e12, ms


def _vpu_block_ms(kind, rows, cols):
    """Per-repetition ms of a VMEM-resident VPU pass over a [rows, cols]
    block: the block is loaded into VMEM once and the math repeated with a
    carry (Pallas), so HBM traffic is excluded — matching the fused
    kernels, whose score/hidden tiles live in VMEM."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(np.random.RandomState(0).randn(rows, cols)).astype(
        jnp.bfloat16)

    def kernel(x_ref, o_ref, *, reps):
        def body(i, c):
            s = (x_ref[:] + c.astype(jnp.bfloat16)).astype(jnp.float32)
            if kind == "softmax":
                # fwd: max, exp, sum, div; bwd-shaped: mul, rowsum, fnma —
                # the per-element op mix of the fused attention kernels.
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                l = jnp.sum(e, axis=1, keepdims=True)
                p = e / l
                r = p * (s - jnp.sum(p * s, axis=1, keepdims=True))
            else:  # gelu fwd + bwd-shaped second evaluation
                g = jax.nn.gelu(s, approximate=True)
                r = g + jax.nn.gelu(s * 1.0001, approximate=True)
            return c + r[0:1, 0:1] * 1e-30
        c = jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 1), jnp.float32))
        o_ref[:] = jnp.broadcast_to(c, o_ref.shape)

    def run(reps):
        f = pl.pallas_call(
            functools.partial(kernel, reps=reps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        return jax.jit(lambda x: f(x)[0, 0])

    t_lo = _time_s(run(ITERS_LO), x)
    t_hi = _time_s(run(ITERS_HI), x)
    return max(t_hi - t_lo, 1e-9) * 1000.0 / (ITERS_HI - ITERS_LO)


def _hbm_rate_gbs(nbytes=256 * 1024 * 1024):
    """Triad-style sustained HBM GB/s (read 2 + write 1 per element). The
    carry feeds the `a` term so the whole body is loop-variant."""
    import jax
    import jax.numpy as jnp

    n = nbytes // 2  # bf16 elements
    a = jnp.ones((n,), jnp.bfloat16)
    b = jnp.full((n,), 0.5, jnp.bfloat16)

    def make_chain(iters):
        def chain(a, b):
            def body(i, c):
                out = (a + c) * jnp.asarray(0.999, a.dtype) + b
                return c + out[0] * jnp.asarray(1e-30, a.dtype)
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), a.dtype))
        return chain

    ms = _slope_ms(make_chain, a, b)
    return 3.0 * nbytes / (ms * 1e-3) / 1e9, ms


def derive_floor(B: int, rates: dict) -> dict:
    R = B * N_PAD            # token rows through every layer GEMM
    BH = B * HEADS

    tf_wide, tf_k64, tf_kseq = (rates["wide_tfs"], rates["k64_tfs"],
                                rates["kseq_tfs"])

    def gemm_ms(flops, tfs):
        return flops / (tfs * 1e12) * 1e3

    # --- wide-K weight GEMMs: fwd + dX + dW = 3 duals each, per layer ---
    wide_flops = DEPTH * 3 * 2.0 * R * (
        DIM * 3 * DIM        # qkv
        + DIM * DIM          # out proj
        + DIM * MLP_DIM      # fc1
        + MLP_DIM * DIM      # fc2
    )
    # patchify: fwd GEMM + one-GEMM dW (no dX into the input volume)
    wide_flops += 2 * 2.0 * B * N_PATCHES * PATCH * DIM
    t_wide = gemm_ms(wide_flops, tf_wide)

    # --- attention dots, 2*B*H*N^2*DH flops each ---
    dot = 2.0 * BH * N_PAD * N_PAD * DH
    # K=64 contractions: S=QK^T (fwd), S recompute (bwd), dP=dO V^T
    t_k64 = gemm_ms(DEPTH * 3 * dot, tf_k64)
    # K=seq contractions: PV (fwd), dV, dQ, dK
    t_kseq = gemm_ms(DEPTH * 4 * dot, tf_kseq)

    # --- serial VPU passes (A/B-confirmed non-overlapping with MXU) ---
    # softmax block measured at [SOFTMAX_ROWS, N_PAD]; the workload runs
    # BH * N_PAD rows of it per layer (fwd) — the bwd mix is inside the
    # block measurement. GELU runs over R x MLP_DIM per layer.
    t_softmax = DEPTH * rates["softmax_block_ms"] * (
        BH * N_PAD / rates["softmax_rows"])
    t_gelu = DEPTH * rates["gelu_block_ms"] * (R / rates["gelu_rows"])

    # --- optimizer HBM traffic: 7 bf16 arrays of nparams ---
    opt_bytes = 7.0 * N_PARAMS * 2
    t_opt = opt_bytes / (rates["hbm_gbs"] * 1e9) * 1e3

    floor_ms = t_wide + t_k64 + t_kseq + t_softmax + t_gelu + t_opt
    max_vols = B / (floor_ms * 1e-3)
    target_ms = B / 225.0 * 1e3
    return {
        "batch": B,
        "terms_ms": {
            "wide_gemms": round(t_wide, 2),
            "attn_k64_dots": round(t_k64, 2),
            "attn_kseq_dots": round(t_kseq, 2),
            "softmax_vpu": round(t_softmax, 2),
            "gelu_vpu": round(t_gelu, 2),
            "optimizer_hbm": round(t_opt, 2),
        },
        "floor_ms": round(floor_ms, 2),
        "max_vols_per_sec": round(max_vols, 1),
        "target_225_needs_ms": round(target_ms, 2),
        "target_below_floor": bool(target_ms < floor_ms),
        "excluded_costs": "LN fwd+bwd, dropout, residual adds, patchify "
                          "stripe copies, bias grads, kernel ramp/drain — "
                          "floor is an underestimate",
    }


SOFTMAX_ROWS = 256
GELU_ROWS = 256


def main():
    record = "--record" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if a != "--record"] or [8, 16]

    # Machine rates at the LARGEST requested batch's GEMM shapes (rates
    # are row-count-insensitive above a few thousand rows); VPU blocks are
    # fixed-size and scaled by row count in derive_floor.
    Bmax = max(batches)
    R = Bmax * N_PAD
    BH = Bmax * HEADS
    wide_tfs, _ = _gemm_rate_tfs(R, DIM, MLP_DIM)
    k64_tfs, _ = _gemm_rate_tfs(N_PAD, DH, N_PAD, batch=BH)
    kseq_tfs, _ = _gemm_rate_tfs(N_PAD, N_PAD, DH, batch=BH)
    softmax_ms = _vpu_block_ms("softmax", SOFTMAX_ROWS, N_PAD)
    gelu_ms = _vpu_block_ms("gelu", GELU_ROWS, MLP_DIM)
    hbm_gbs, _ = _hbm_rate_gbs()

    rates = {
        "wide_tfs": wide_tfs,
        "k64_tfs": k64_tfs,
        "kseq_tfs": kseq_tfs,
        "hbm_gbs": hbm_gbs,
        "softmax_block_ms": softmax_ms,
        "softmax_rows": SOFTMAX_ROWS,
        "gelu_block_ms": gelu_ms,
        "gelu_rows": GELU_ROWS,
    }
    measured = {
        "wide_gemm_tfs": round(wide_tfs, 1),
        "attn_k64_tfs": round(k64_tfs, 1),
        "attn_kseq_tfs": round(kseq_tfs, 1),
        "softmax_fwdbwd_ms_per_256rows": round(softmax_ms, 4),
        "gelu_fwdbwd_ms_per_256rows": round(gelu_ms, 4),
        "hbm_triad_gbs": round(hbm_gbs, 1),
    }
    print(json.dumps({"measured_rates": measured}))

    floors = []
    for B in batches:
        floors.append(derive_floor(B, rates))
        print(json.dumps(floors[-1]))

    if record:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "FLOOR.json")
        with open(out, "w") as f:
            json.dump({"measured_rates": measured, "floors": floors}, f,
                      indent=1)
        print(f"recorded -> {out}")


if __name__ == "__main__":
    main()
