"""On-chip verification + A/B for hardware-PRNG dropout (GAVIKO_DROPOUT_PRNG).

The prng path (ops/flash_attention.py:_prng_keep_block) cannot run in CPU
interpret mode (pltpu.prng_* has no lowering there), so its correctness is
proved ON the chip, against an XLA reference driven by the kernel's OWN bits:

1. extract the keep mask with an emit-bits Pallas kernel that reuses
   _prng_keep_block with the forward's exact (grid, salt, row chunking);
2. the XLA forward under that explicit mask must match the compiled fused
   kernel (same softmax-then-mask semantics);
3. jax.grad of the XLA forward under that mask must match the fused kernel's
   custom-VJP gradients — this FAILS LOUDLY if the backward's replayed bits
   differ from the forward's (the whole replay contract);
4. marginal keep rate and adjacent row/col joint keep rates are checked
   against (1-q) and (1-q)^2 (the CPU-side statistical test cannot cover the
   hardware stream).

Tolerances are RELATIVE (5e-3): on-chip f32 dots round through the MXU at
bf16 granularity (CLAUDE.md; ~3.3e-3 measured here on unit-variance randn
inputs at N=1008), while a mask mismatch shows up at O(1) — the probe
PROVES that by also checking a wrong-seed mask, which must fail big.

Run:  python scripts/prng_dropout_probe.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["GAVIKO_DROPOUT_PRNG"] = "1"

from gaviko_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaviko_tpu.ops import flash_attention as fa

B, HEADS, DH, N = 2, 4, 64, 1008  # production-like: fwd bq 1008, bwd bq 504
RATE = 0.1
SCALE = DH ** -0.5


def extract_mask(seed, n_pad):
    """(B, HEADS, n_pad, n_pad) int8 keep bits via the kernel's own chunking."""
    use, chunk = fa._prng_plan(n_pad)
    assert use, "prng plan refused — probe must run compiled on TPU"
    hp = 2
    nh = HEADS // hp
    block_q = fa._bwd_pick_block_q(n_pad)  # any multiple of chunk works

    def kernel(seed_ref, out_ref):
        b, h, qb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        for j in range(hp):
            salt = b * HEADS + h * hp + j
            keep = fa._prng_keep_block(block_q, n_pad, seed_ref[0], salt,
                                       qb * block_q, chunk, RATE)
            out_ref[j] = keep.astype(jnp.int8)

    out = pl.pallas_call(
        kernel,
        grid=(B, nh, n_pad // block_q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((None, hp, block_q, n_pad),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HEADS, n_pad, n_pad), jnp.int8),
    )(seed)
    return out


def ref_with_mask(qkv, keep):
    """XLA forward with an EXPLICIT mask, same semantics as the fused kernel
    (softmax over real columns, then mask, then 1/(1-q))."""
    inner = HEADS * DH

    def to_heads(t):
        return t.reshape(B, N, HEADS, DH).transpose(0, 2, 1, 3)

    q, k, v = (to_heads(qkv[..., i * inner:(i + 1) * inner]) for i in range(3))
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(keep, p * (1.0 / (1.0 - RATE)), 0.0)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, inner)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean(np.abs(a - b)) / max(np.mean(np.abs(b)), 1e-12))


def main():
    assert jax.default_backend() == "tpu", "probe must run on the chip"
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * HEADS * DH).astype(np.float32))
    seed = jnp.asarray([12345], jnp.int32)

    keep = np.asarray(jax.jit(extract_mask, static_argnums=1)(seed, N)) > 0

    # 4) statistics of the hardware stream
    rate = 1.0 - keep.mean()
    row_joint = (keep[:, :, :-1, :] & keep[:, :, 1:, :]).mean()
    col_joint = (keep[:, :, :, :-1] & keep[:, :, :, 1:]).mean()
    print(f"marginal drop rate: {rate:.5f} (want {RATE})")
    print(f"adjacent-row joint keep: {row_joint:.5f} (want {(1-RATE)**2:.5f})")
    print(f"adjacent-col joint keep: {col_joint:.5f} (want {(1-RATE)**2:.5f})")
    assert abs(rate - RATE) < 2e-3
    assert abs(row_joint - (1 - RATE) ** 2) < 2e-3
    assert abs(col_joint - (1 - RATE) ** 2) < 2e-3

    fused = functools.partial(fa.fused_mhsa, heads=HEADS, dim_head=DH,
                              scale=SCALE, n_true=N, dropout_rate=RATE)

    # 2) forward under the extracted mask (+ negative control: the same
    # check against a WRONG-seed mask must fail by orders of magnitude,
    # proving the tolerance discriminates mask identity from MXU rounding)
    got = jax.jit(lambda x: fused(x, seed))(qkv)
    want = jax.jit(ref_with_mask)(qkv, jnp.asarray(keep))
    e = rel_err(got, want)
    wrong = np.asarray(jax.jit(extract_mask, static_argnums=1)(
        seed + 1, N)) > 0
    e_wrong = rel_err(got, jax.jit(ref_with_mask)(qkv, jnp.asarray(wrong)))
    print(f"forward rel err vs masked XLA ref: {e:.2e} "
          f"(wrong-seed control: {e_wrong:.2e})")
    assert e < 5e-3, "forward bits do not match the extracted mask"
    assert e_wrong > 20 * e, "probe cannot discriminate masks"

    # 3) gradients — fails if the backward replays different bits
    g = jnp.asarray(rng.randn(B, N, HEADS * DH).astype(np.float32))
    grad_fused = jax.jit(jax.grad(lambda x: jnp.vdot(fused(x, seed), g)))(qkv)
    grad_ref = jax.jit(jax.grad(
        lambda x: jnp.vdot(ref_with_mask(x, jnp.asarray(keep)), g)))(qkv)
    e = rel_err(grad_fused, grad_ref)
    print(f"gradient rel err vs masked XLA ref: {e:.2e}")
    assert e < 5e-3, "backward replay bits differ from the forward's"

    # determinism across dispatches
    got2 = jax.jit(lambda x: fused(x, seed))(qkv)
    assert np.array_equal(np.asarray(got), np.asarray(got2))
    print("deterministic across dispatches: yes")
    print("PRNG dropout probe: ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
