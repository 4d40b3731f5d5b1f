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

if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPERIMENTS)
    for name in names:
        EXPERIMENTS[name]()
