"""Mosaic scheduling experiments on the real chip (developer tool).

Questions these experiments answer (results recorded in ARCHITECTURE.md):
1. Does Mosaic overlap MXU matmuls with independent VPU work in one program?
2. Are lane-axis (axis=-1) reductions slower than sublane-axis (axis=0)
   reductions for the softmax shape, and by how much?
3. What does a raw exp pass cost vs a full softmax?

Methodology: chained iterations inside one jit (data dependence), one scalar
readback, ITERS amortizes the ~25 ms axon dispatch.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("LAB_ITERS", "200"))
N = 1008
DIM = 768


def timeit(jitted, *args):
    float(jitted(*args))
    t0 = time.time()
    float(jitted(*args))
    return (time.time() - t0) / ITERS * 1000


def _chain(fn, x):
    import jax
    import jax.numpy as jnp

    def body(i, x):
        out = fn(x)
        return x + out.reshape(-1)[0].astype(x.dtype) * jnp.asarray(
            1e-30, x.dtype)

    return jax.lax.fori_loop(0, ITERS, body, x).reshape(-1)[0]


def _call(kernel, x, n_out=None, extra=None):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    args = [x] + (extra or [])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape if n_out is None else n_out,
                                       x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def softmax_lane():
    """Softmax reducing along the LANE axis (current kernels' layout)."""
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, o_ref):
        s = x_ref[:]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o_ref[:] = p / l

    x = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32))
    ms = timeit(jax.jit(lambda x: _chain(lambda t: _call(kernel, t), x)), x)
    print(f"softmax lane-axis   (1008^2 f32): {ms:.3f} ms")


def softmax_sublane():
    """Softmax reducing along the SUBLANE axis."""
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, o_ref):
        s = x_ref[:]
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        o_ref[:] = p / l

    x = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32))
    ms = timeit(jax.jit(lambda x: _chain(lambda t: _call(kernel, t), x)), x)
    print(f"softmax sublane-axis(1008^2 f32): {ms:.3f} ms")


def exp_only():
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.exp(x_ref[:])

    x = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32))
    ms = timeit(jax.jit(lambda x: _chain(lambda t: _call(kernel, t), x)), x)
    print(f"exp only            (1008^2 f32): {ms:.3f} ms")


def _mm_kernel(x_ref, w_ref, o_ref, *, reps):
    import jax
    import jax.numpy as jnp

    acc = x_ref[:]
    for _ in range(reps):
        acc = jax.lax.dot_general(
            acc, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
    o_ref[:] = acc


def mm_only(reps=8):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, DIM)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(DIM, DIM) * 0.02).astype(jnp.bfloat16)

    kern = functools.partial(_mm_kernel, reps=reps)
    ms = timeit(jax.jit(
        lambda x: _chain(lambda t: _call(kern, t, extra=[w]), x)), x)
    flops = 2 * N * DIM * DIM * reps
    print(f"matmul x{reps} (1008x768x768 bf16): {ms:.3f} ms "
          f"({flops / ms / 1e9:.0f} GFLOP/s)")


def mm_plus_exp(reps=8):
    """Independent matmul chain + exp passes interleaved in one kernel.
    If Mosaic overlaps MXU and VPU, this costs ~max of the two."""
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, s_ref, w_ref, o_ref):
        acc = x_ref[:]
        e = s_ref[:]
        for _ in range(reps):
            acc = jax.lax.dot_general(
                acc, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)
            e = jnp.exp(e * 0.9)
        o_ref[:] = acc + e[:, :DIM].astype(acc.dtype)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, DIM)).astype(jnp.bfloat16)
    s = jnp.asarray(rng.randn(N, N).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(DIM, DIM) * 0.02).astype(jnp.bfloat16)

    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=_jax.ShapeDtypeStruct((N, DIM), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, s, w)

    ms = timeit(jax.jit(lambda x: _chain(call, x)), x)
    print(f"matmul x{reps} + exp x{reps} interleaved: {ms:.3f} ms "
          f"(overlap if ~= max of the two)")


def exp_block(reps=8):
    """Just the exp part of mm_plus_exp, same rep count, for comparison."""
    import jax
    import jax.numpy as jnp

    def kernel(s_ref, o_ref):
        e = s_ref[:]
        for _ in range(reps):
            e = jnp.exp(e * 0.9)
        o_ref[:] = e

    s = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32) * 0.1)
    ms = timeit(jax.jit(lambda s: _chain(lambda t: _call(kernel, t), s)), s)
    print(f"exp x{reps} chained (1008^2 f32): {ms:.3f} ms")


EXPERIMENTS = {
    "softmax_lane": softmax_lane,
    "softmax_sublane": softmax_sublane,
    "exp_only": exp_only,
    "mm_only": mm_only,
    "mm_plus_exp": mm_plus_exp,
    "exp_block": exp_block,
}

def sum_block(reps=8):
    """8 chained lane-axis sum+broadcast passes (the softmax l pattern)."""
    import jax
    import jax.numpy as jnp

    def kernel(s_ref, o_ref):
        e = s_ref[:]
        for _ in range(reps):
            l = jnp.sum(e, axis=1, keepdims=True)
            e = e + l * 1e-30
        o_ref[:] = e

    s = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32) * 0.1)
    ms = timeit(jax.jit(lambda s: _chain(lambda t: _call(kernel, t), s)), s)
    print(f"lane-sum x{reps} chained (1008^2 f32): {ms:.3f} ms")


def max_block(reps=8):
    """8 chained lane-axis max passes (the softmax m pattern)."""
    import jax
    import jax.numpy as jnp

    def kernel(s_ref, o_ref):
        e = s_ref[:]
        for _ in range(reps):
            m = jnp.max(e, axis=1, keepdims=True)
            e = e + m * 1e-30
        o_ref[:] = e

    s = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32) * 0.1)
    ms = timeit(jax.jit(lambda s: _chain(lambda t: _call(kernel, t), s)), s)
    print(f"lane-max x{reps} chained (1008^2 f32): {ms:.3f} ms")


def mm_plus_sum(reps=8):
    """Independent matmul chain + lane-sum passes: do REDUCTIONS overlap?"""
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, s_ref, w_ref, o_ref):
        acc = x_ref[:]
        e = s_ref[:]
        for _ in range(reps):
            acc = jax.lax.dot_general(
                acc, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)
            l = jnp.sum(e, axis=1, keepdims=True)
            e = e + l * 1e-30
        o_ref[:] = acc + e[:, :DIM].astype(acc.dtype)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, DIM)).astype(jnp.bfloat16)
    s = jnp.asarray(rng.randn(N, N).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(DIM, DIM) * 0.02).astype(jnp.bfloat16)

    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=_jax.ShapeDtypeStruct((N, DIM), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, s, w)

    ms = timeit(jax.jit(lambda x: _chain(call, x)), x)
    print(f"matmul x{reps} + lane-sum x{reps} interleaved: {ms:.3f} ms")


def softmax_x8(reps=8):
    """8 chained FULL softmaxes (max+exp+sum+div) over 1008^2."""
    import jax
    import jax.numpy as jnp

    def kernel(s_ref, o_ref):
        e = s_ref[:]
        for _ in range(reps):
            m = jnp.max(e, axis=1, keepdims=True)
            p = jnp.exp(e - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            e = e + (p / l) * 1e-30
        o_ref[:] = e

    s = jnp.asarray(np.random.RandomState(0).randn(N, N).astype(np.float32) * 0.1)
    ms = timeit(jax.jit(lambda s: _chain(lambda t: _call(kernel, t), s)), s)
    print(f"softmax x{reps} chained (1008^2 f32): {ms:.3f} ms")


EXPERIMENTS.update({
    "sum_block": sum_block,
    "max_block": max_block,
    "mm_plus_sum": mm_plus_sum,
    "softmax_x8": softmax_x8,
})



def _attn_bwd_ops(j, bufs, interleave=False):
    pass  # placeholder (structure lives in attn_serial/attn_ilv below)


def attn_serial():
    """Proxy of the fused-MHSA backward: per-head serial chain, hp=2."""
    import jax
    import jax.numpy as jnp
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 64

    def kernel(q_ref, k_ref, v_ref, do_ref, ml_ref, dq_ref, o_ref):
        for j in range(2):
            sl = slice(j * D, (j + 1) * D)
            q = q_ref[:, sl]; k = k_ref[:, sl]; v = v_ref[:, sl]
            do = do_ref[:, sl].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            ml2 = ml_ref[:, 2 * j:2 * j + 1]
            p = jnp.exp2(s - ml2)
            delta = jnp.sum(do * do, axis=1, keepdims=True)
            dv = jax.lax.dot_general(p.astype(v.dtype), do.astype(v.dtype),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dpt = jax.lax.dot_general(do.astype(v.dtype), v,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ds = (p * (dpt - delta)).astype(q.dtype)
            dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dq_ref[:, sl] = (dq * 0.125).astype(dq_ref.dtype)
            o_ref[:, sl] = (dk + dv).astype(o_ref.dtype)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    do = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    ml = jnp.asarray(rng.randn(N, 4).astype(np.float32) + 8)

    def call(q):
        outs = pl.pallas_call(
            kernel,
            out_shape=[_jax.ShapeDtypeStruct((N, 2 * D), jnp.bfloat16)] * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q, k, v, do, ml)
        return outs[0]

    ms = timeit(jax.jit(lambda q: _chain(call, q)), q)
    print(f"attn-bwd proxy SERIAL (hp=2, n=1008): {ms:.3f} ms")


def attn_ilv():
    """Same ops 2-way interleaved across the head pair."""
    import jax
    import jax.numpy as jnp
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 64

    def kernel(q_ref, k_ref, v_ref, do_ref, ml_ref, dq_ref, o_ref):
        sls = [slice(0, D), slice(D, 2 * D)]
        qj = [q_ref[:, s] for s in sls]
        kj = [k_ref[:, s] for s in sls]
        vj = [v_ref[:, s] for s in sls]
        doj = [do_ref[:, s].astype(jnp.float32) for s in sls]
        s_ = [jax.lax.dot_general(qj[j], kj[j], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for j in range(2)]
        p_ = [jnp.exp2(s_[j] - ml_ref[:, 2 * j:2 * j + 1]) for j in range(2)]
        delta = [jnp.sum(doj[j] * doj[j], axis=1, keepdims=True)
                 for j in range(2)]
        dv = [jax.lax.dot_general(p_[j].astype(vj[j].dtype),
                                  doj[j].astype(vj[j].dtype),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for j in range(2)]
        dpt = [jax.lax.dot_general(doj[j].astype(vj[j].dtype), vj[j],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for j in range(2)]
        ds = [(p_[j] * (dpt[j] - delta[j])).astype(qj[j].dtype)
              for j in range(2)]
        dq = [jax.lax.dot_general(ds[j], kj[j], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for j in range(2)]
        dk = [jax.lax.dot_general(ds[j], qj[j], (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for j in range(2)]
        for j, s in enumerate(sls):
            dq_ref[:, s] = (dq[j] * 0.125).astype(dq_ref.dtype)
            o_ref[:, s] = (dk[j] + dv[j]).astype(o_ref.dtype)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    do = jnp.asarray(rng.randn(N, 2 * D)).astype(jnp.bfloat16)
    ml = jnp.asarray(rng.randn(N, 4).astype(np.float32) + 8)

    def call(q):
        outs = pl.pallas_call(
            kernel,
            out_shape=[_jax.ShapeDtypeStruct((N, 2 * D), jnp.bfloat16)] * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q, k, v, do, ml)
        return outs[0]

    ms = timeit(jax.jit(lambda q: _chain(call, q)), q)
    print(f"attn-bwd proxy INTERLEAVED (hp=2, n=1008): {ms:.3f} ms")


EXPERIMENTS.update({
    "attn_serial": attn_serial,
    "attn_ilv": attn_ilv,
})


if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPERIMENTS)
    for name in names:
        EXPERIMENTS[name]()
