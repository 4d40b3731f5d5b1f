"""Pallas TPU kernels: fused attention + masked local attention.

The reference materializes full [B, H, N, N] score tensors in HBM
(src/model/vision_transformer.py:65-70) and additionally a precomputed
1000x1000 local mask (src/model/gaviko.py:218-227). These kernels keep the
score matrix in VMEM only, and evaluate GAViKO's 3D-window mask as a
closed-form predicate on patch-grid coordinates instead of loading an N^2
mask from HBM.

Two regimes (chosen automatically by sequence length):
- **whole-K** (N <= WHOLE_K_MAX, covers every GAViKO workload at N ~ 1001 -
  1051): one program per (batch*head, q-block) computes the full score block
  against all keys in a single MXU dot — measured ~1.5x faster than XLA's
  fused path on v5e and far faster than a blockwise streaming loop, because
  at these sizes K/V fit VMEM and the bottleneck is the f32 softmax on the
  VPU, not HBM.
- **streaming** (larger N): classic blockwise online-softmax
  (fori_loop carrying m/l/acc) so VMEM never holds N^2.

Numerics: dots run on the MXU in the input dtype (bf16 fast path) with f32
accumulation (preferred_element_type); softmax is f32. Probabilities are cast
back to the value dtype for the PV dot.

Backward: custom_vjp with either a whole-K Pallas backward (bf16 fits VMEM)
or a rematerialized XLA VJP.

Training-path dropout runs IN-KERNEL: attention-prob dropout (ref:
vision_transformer.py:50, 65-70) uses portable hash-derived bits
(ops/hash_dropout.py) applied to the post-softmax probabilities, and the
backward replays the identical mask from the same (seed, coordinates) — no
N^2 residual, and the replay is exactly testable on CPU because the hash
runs identically in interpret mode and plain XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaviko_tpu.ops.hash_dropout import (
    _M1,
    _ROW,
    _SALT,
    _threshold,
    keep_mask,
)

LOG2E = float(np.log2(np.e))  # change-of-base for exp->exp2 folding


def _no_seed():
    return jnp.zeros((1,), jnp.int32)


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)

NEG_INF = float("-inf")
WHOLE_K_MAX = 2048  # whole-K score block: 2048^2 f32 = 16 MB > VMEM; real cap
                    # is lower, but grid q-blocking keeps blocks <= 1024 rows.


def _use_interpret() -> bool:
    # Compiled on TPU; interpret mode for CPU tests.
    return jax.default_backend() != "tpu"


# --- hardware-PRNG dropout bits (compiled TPU path) — MEASURED OFF ---------
#
# The portable hash costs 5 VPU int ops per masked element and the training
# path evaluates it over the N^2 block twice (forward + backward replay).
# pltpu.prng_random_bits generates bits on the dedicated PRNG unit instead;
# keep = bits >= threshold is ONE compare. Replay safety: the stream is
# reseeded per ABSOLUTE row chunk of G rows (G = gcd of the forward and
# default-backward q-block sizes, so both grids chunk identically), making
# the bits a pure function of (seed, head salt, absolute row chunk) exactly
# like the hash. pltpu.prng_* has no CPU interpret-mode lowering, so this
# path is TPU-compiled-only and opt-in via GAVIKO_DROPOUT_PRNG=1; the hash
# stays the default and the only path CPU parity tests exercise.
# On-chip verification: scripts/prng_dropout_probe.py extracts the kernel's
# bits with the same chunking and checks the XLA-reference forward AND
# gradients against the compiled kernel under the extracted mask (plus
# wrong-seed negative control and marginal/pairwise keep-rate stats).
# A/B on the real chip (vit-b16 fft B8 train, clean host): PRNG is SLOWER —
# fwd 14.45 vs 13.78 ms, fwd+bwd 41.57 vs 39.88 ms, full step 49.49 vs
# 48.19 ms. The hash's int ops pipeline under the f32 softmax VPU work,
# while generation + per-chunk reseeding serializes. Kept opt-in as the
# measured register entry; the hash stays the default.

# Backward q-block VMEM budget. 14 MB makes the WHOLE-K backward (block_q
# = n_pad, single K/V load, no cross-block dK/dV scratch accumulation) the
# default at every GAViKO sequence length (N <= ~1080); the Mosaic scoped
# limit is raised to match below. Round-4 full-step A/B on v5e: whole-K
# beat the old 7 MB q-blocked default everywhere — vit-b16 fft B8
# 188.5 -> 193.0, B16 195.7 -> 200.4, GAViKO vit-l16 PEFT B4 65.2 -> 68.8
# vol/s (round 3 measured a wash, but on an ISOLATED attention microbench;
# in the full step the fusion/scheduling context differs). Longer
# sequences still down-shift block_q automatically. GAVIKO_BWD_VMEM
# overrides.
_BWD_VMEM_DEFAULT = 14_000_000


def _bwd_pick_block_q(n_pad: int, budget: int = _BWD_VMEM_DEFAULT) -> int:
    """Backward q-block: ~3 (block_q, n_pad) f32 buffers within ``budget``."""
    block_q = n_pad
    while 3 * block_q * n_pad * 4 > budget and block_q % 2 == 0 \
            and (block_q // 2) % 8 == 0:
        block_q //= 2
    return block_q


def _prng_dropout_requested() -> bool:
    import os

    return os.environ.get("GAVIKO_DROPOUT_PRNG", "0") == "1" \
        and not _use_interpret()


def _prng_plan(n_pad: int):
    """-> (use_prng, chunk_rows). Both the forward and the backward call this
    with the same n_pad, so they agree on the chunk granularity; prng is
    refused when the backward would take its XLA fallback (which replays the
    hash and could not match a prng forward)."""
    if not _prng_dropout_requested():
        return False, 0
    bq_bwd = _bwd_pick_block_q(n_pad)
    # Mirrors the backward's degenerate-shape gate: prng is refused only
    # when the backward actually takes its XLA fallback.
    if 3 * bq_bwd * n_pad * 4 > max(12_000_000, _BWD_VMEM_DEFAULT):
        return False, 0
    import math

    g = math.gcd(_pick_block_q(n_pad, 2), bq_bwd)
    return True, g


def _prng_keep_block(block_q, n_pad, seed, salt, row0, chunk, rate):
    """In-kernel keep mask from the hardware PRNG, bit-identical for any
    program whose q-block is a multiple of ``chunk`` rows: each absolute
    ``chunk``-row span reseeds with a scalar mix of (seed, salt, span index)
    before generating its (chunk, n_pad) bits."""
    thr = _threshold(rate)
    rows = []
    for ci in range(block_q // chunk):
        idx = row0 // chunk + ci  # absolute chunk index
        s = seed + salt * _SALT + idx * _ROW
        s = (s ^ jax.lax.shift_right_logical(s, 16)) * _M1
        pltpu.prng_seed(s)
        bits = pltpu.bitcast(pltpu.prng_random_bits((chunk, n_pad)),
                             jnp.int32)
        rows.append(bits >= thr)
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_plan(N: int) -> Tuple[int, int, int]:
    """-> (block_q, block_k, n_pad). Whole-K when the score block fits VMEM."""
    if N <= WHOLE_K_MAX:
        n_pad = _round_up(N, 8)
        # Cap q-block rows so block_q * n_pad * 4B stays ~<= 4.5 MB.
        block_q = n_pad
        while block_q * n_pad * 4 > 4_500_000 and block_q % 2 == 0:
            block_q //= 2
        n_pad = _round_up(N, block_q)
        return block_q, n_pad, n_pad
    block_q, block_k = 512, 512
    return block_q, block_k, _round_up(N, 512)


# ---------------------------------------------------------------------------
# Flash attention (full, unmasked)
# ---------------------------------------------------------------------------

def _attn_whole_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_true):
    """Single-dot whole-K attention for one q block."""
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_ref.shape[0] != n_true:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_true, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o / l).astype(o_ref.dtype)


def _attn_stream_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_true, block_k):
    """Blockwise online-softmax for long sequences."""
    n_pad = k_ref.shape[0]
    block_q, d = q_ref.shape
    q = q_ref[:]

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(col < n_true, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_pad // block_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q, k, v: [B, H, N, D] -> [B, H, N, D]. Softmax over keys."""
    return _flash_forward(q, k, v, scale)


def _flash_forward(q, k, v, scale):
    B, H, N, D = q.shape
    block_q, block_k, n_pad = _block_plan(N)

    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    qf = q.reshape(B * H, n_pad, D)
    kf = k.reshape(B * H, n_pad, D)
    vf = v.reshape(B * H, n_pad, D)

    if N <= WHOLE_K_MAX:
        kernel = functools.partial(_attn_whole_kernel, scale=scale, n_true=N)
    else:
        kernel = functools.partial(
            _attn_stream_kernel, scale=scale, n_true=N, block_k=block_k
        )
    out = pl.pallas_call(
        kernel,
        grid=(B * H, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
        interpret=_use_interpret(),
    )(qf, kf, vf)
    out = out.reshape(B, H, n_pad, D)
    return out[:, :, :N, :] if n_pad != N else out


def _flash_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res

    def ref(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Layout-native fused MHSA: consumes the qkv projection output directly
# ---------------------------------------------------------------------------
#
# The [B, N, 3*H*D] qkv tensor is read head-pair-wise via BlockSpec index
# maps — no split/transpose/reshape HLOs around the kernel (profiling showed
# those copies cost ~20% of a vit-b16 forward). Two heads per program keep
# the lane dim at 128 (Mosaic requires last block dim % 128).

def _fused_mhsa_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, ml_ref=None, *,
                       scale, n_true, hp, dim_head, heads, dropout_rate,
                       emit_ml=False, prng_chunk=0):
    b, h, qb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    block_q = q_ref.shape[0]
    n_pad = k_ref.shape[0]
    # Padded keys are masked by an additive bias row folded into the exp
    # subtract: the row max over unmasked garbage columns is still an upper
    # bound, so softmax stays exact without a select pass over the N^2 block.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    bias = jnp.where(col < n_true, 0.0, -1e30)
    # scale AND log2(e) folded into q — an (n, d) pass instead of an (n, n)
    # score multiply — so scores are in log2 units and the softmax exp is a
    # bare exp2 (jnp.exp would re-multiply the whole N^2 block by log2e).
    # Softmax is invariant to the change of base: m and l are computed in
    # the same units, and the saved (m, l) contract is "log2-unit stats"
    # (the backward reconstructs P with the identical exp2 formula).
    scale2 = scale * LOG2E
    for j in range(hp):
        sl = slice(j * dim_head, (j + 1) * dim_head)
        q = (q_ref[:, sl].astype(jnp.float32) * scale2).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m + bias)
        if dropout_rate > 0.0:
            # Reference order: softmax -> dropout -> PV (vision_transformer.py
            # :65-70); l is the PRE-dropout row sum, so it's reduced before
            # masking the raw exp, and 1/(1-q) folds into the final scale.
            l = jnp.sum(p, axis=1, keepdims=True)
            salt = b * heads + h * hp + j
            if prng_chunk:
                keep = _prng_keep_block(block_q, n_pad, seed_ref[0], salt,
                                        qb * block_q, prng_chunk,
                                        dropout_rate)
            else:
                keep = keep_mask(p.shape, seed_ref[0], dropout_rate,
                                 salt=salt, row_offset=qb * block_q)
            p = jnp.where(keep, p, 0.0)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = o * (1.0 / (1.0 - dropout_rate))
            o_ref[:, sl] = (o / l).astype(o_ref.dtype)
            if emit_ml:
                ml_ref[j, :, 0:1] = m
                ml_ref[j, :, 1:2] = l
        elif dim_head < 128:
            # Ones-column ride-along: pad V to a full 128-lane tile with ones
            # so one MXU dot returns [o | row-sum] — the row sum rides the
            # otherwise-wasted lanes (dim_head 64 < the 128-lane MXU tile)
            # and the VPU lane-reduction pass disappears. A/B on-chip (round
            # 3): removing this for a plain jnp.sum REGRESSED the layer
            # 1.120 -> 1.203 ms at B32 — the in-kernel lane reduction does
            # NOT overlap the MXU here, despite isolated mosaic_lab runs
            # suggesting reductions are free. Keep the ride-along.
            ones = jnp.ones((n_pad, 128 - dim_head), v_ref.dtype)
            ve = jnp.concatenate([v_ref[:, sl], ones], axis=1)
            ol = jax.lax.dot_general(
                p.astype(v_ref.dtype), ve, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = ol[:, :dim_head] / ol[:, dim_head:dim_head + 1]
            o_ref[:, sl] = o.astype(o_ref.dtype)
            if emit_ml:
                ml_ref[j, :, 0:1] = m
                ml_ref[j, :, 1:2] = ol[:, dim_head:dim_head + 1]
        else:
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[:, sl] = (o / l).astype(o_ref.dtype)
            if emit_ml:
                ml_ref[j, :, 0:1] = m
                ml_ref[j, :, 1:2] = l


def fused_mhsa_supported(heads: int, dim_head: int, N: int) -> bool:
    return (
        heads % 2 == 0
        and (2 * dim_head) % 128 == 0
        and N <= WHOLE_K_MAX
    )


def _pick_block_q(n_pad: int, hp: int) -> int:
    """Largest divisor of n_pad (multiple of 8) keeping the f32 score block
    under ~4.5 MB VMEM."""
    bq = n_pad
    while bq * n_pad * 4 > 4_500_000:
        half = bq // 2
        if half % 8 != 0 or n_pad % half != 0:
            break
        bq = half
    return bq


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_mhsa(qkv, seed, heads: int, dim_head: int, scale: float,
               n_true: int, dropout_rate: float = 0.0):
    """qkv: [B, N_pad, 3*heads*dim_head] -> [B, N_pad, heads*dim_head].

    Rows >= n_true are padding: they may hold garbage on output (their
    queries still attend real keys) but never influence rows < n_true.
    ``seed``: (1,) int32 hash-dropout seed (ignored when dropout_rate == 0);
    the backward replays the identical mask from it.

    Contract — bounded pad keys: pad-key columns are masked by an ADDITIVE
    bias folded into the exp subtract, so the softmax row max is taken over
    the unmasked scores including pad columns. That max is exact as long as
    pad K rows are magnitude-bounded like real rows (true for every caller
    here: pads are zeros or LN-bounded activations). Feeding huge-magnitude
    garbage pad keys would let a masked column dominate m, underflow the
    real columns' exps, and NaN the row. Callers introducing a new pad
    source must keep pad keys bounded (zeros are ideal).
    """
    return _fused_mhsa_forward(qkv, seed, heads, dim_head, scale, n_true,
                               dropout_rate)


def _fused_mhsa_forward(qkv, seed, heads, dim_head, scale, n_true,
                        dropout_rate, emit_ml=False):
    B, n_pad, three_inner = qkv.shape
    inner = three_inner // 3
    hp = 2
    nh = heads // hp
    block_q = _pick_block_q(n_pad, hp)
    grid = (B, nh, n_pad // block_q)
    hd = hp * dim_head
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((None, block_q, hd), lambda b, h, i: (b, i, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n_pad, hd), lambda b, h, i: (b, 0, nh + h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n_pad, hd), lambda b, h, i: (b, 0, 2 * nh + h),
                     memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((None, block_q, hd), lambda b, h, i: (b, i, h),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((B, n_pad, inner), qkv.dtype)
    if emit_ml:
        # Per-row softmax stats (m, l) saved for the backward: f32, laid out
        # (B, heads, n_pad, 2) — lane dim 2 == array dim satisfies Mosaic
        # without 128-padding; ~1.5 MB at vit-b16 B8, and the backward then
        # skips its max- and sum-reductions over the N^2 score block. The
        # per-HEAD (not per-head-pair) layout is hp-agnostic (the backward
        # may group any number of heads per program and still block-index
        # the same array) and it is FASTER: the old (B, nh, n_pad, 2*hp)
        # lane-dim-4 layout cost the backward ~0.29 ms/layer in slow
        # strided (m, l) reads (measured 3.07 -> 2.78 ms/layer at B8).
        out_specs = (o_spec, pl.BlockSpec(
            (None, hp, block_q, 2), lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM))
        out_shape = (o_shape, jax.ShapeDtypeStruct(
            (B, heads, n_pad, 2), jnp.float32))
    else:
        out_specs, out_shape = o_spec, o_shape
    _, prng_chunk = (_prng_plan(n_pad) if dropout_rate > 0.0 else (False, 0))
    out = pl.pallas_call(
        functools.partial(
            _fused_mhsa_kernel, scale=scale, n_true=n_true, hp=hp,
            dim_head=dim_head, heads=heads, dropout_rate=dropout_rate,
            emit_ml=emit_ml, prng_chunk=prng_chunk,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_use_interpret(),
    )(seed, qkv, qkv, qkv)
    return out


def _fused_mhsa_fwd(qkv, seed, heads, dim_head, scale, n_true, dropout_rate):
    out, ml = _fused_mhsa_forward(qkv, seed, heads, dim_head, scale, n_true,
                                  dropout_rate, emit_ml=True)
    return out, (qkv, seed, out, ml)


def _fused_mhsa_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                           ml_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                           *, scale, n_true, hp, dim_head, heads,
                           dropout_rate, prng_chunk=0):
    """Q-blocked attention backward; one (batch, head-pair, q-block) program.

    Flash-backward algebra with P recomputed in VMEM from the SAVED forward
    softmax stats (m, l) — no max/sum reductions over the N^2 block — and
    the dropout mask replayed from (seed, coordinates), identical bits to
    the forward:
      P   = exp(s - m + bias) / l        (bias masks cols >= n_true; m, l
                                          are the forward's row stats)
      P~  = keep/(1-q) * P               (identity when dropout_rate == 0)
      dV  = P~^T dO
      dP~ = dO V^T ;  dP = keep/(1-q) * dP~
      dS  = P * (dP - delta),  delta = rowsum(dO * O)
            (rowsum(dP*P) == rowsum(P~ . dP~) == rowsum(dO*O) EVEN under
             dropout — keep^2 == keep and the 1/(1-q) factors cancel — so
             delta comes from the saved (block_q, d) forward output instead
             of an N^2 multiply+reduce)
      dQ = scale * dS K ; dK = scale * dS^T Q
    Queries are blocked so the live f32 buffers are (block_q, n_pad) — the
    whole-K variant at ~1k tokens needs ~3 full N^2 f32 buffers (>12 MB) and
    cannot fit VMEM. dK/dV accumulate in f32 scratch across the sequential
    q-block dim and are written on the last block. Heads are processed
    sequentially so only a couple of score-sized buffers are live at a time.
    """
    b, h, qb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)
    block_q = q_ref.shape[0]
    n_pad = k_ref.shape[0]
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    if n_pad != n_true:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        bias = jnp.where(col < n_true, 0.0, -1e30)
    else:
        bias = None
    scale2 = scale * LOG2E
    for j in range(hp):
        sl = slice(j * dim_head, (j + 1) * dim_head)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        v = v_ref[:, sl]
        do = do_ref[:, sl].astype(jnp.float32)
        # scale*log2e folded into q (an (n, d) pass; scores in log2 units to
        # match the forward-saved stats) and log2(l) folded into the
        # subtracted row stat — P comes out of ONE exp2 with no N^2 scale
        # or 1/l multiply passes. dK absorbs the scale exactly because it
        # contracts against the pre-scaled q (dK = dS^T (scale q)); dQ gets
        # its scale on the (n, d) output. LOG2E is divided back off both.
        qs = (q.astype(jnp.float32) * scale2).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = ml_ref[j, :, 0:1]
        l = ml_ref[j, :, 1:2]
        ml2 = m + jnp.log2(jnp.maximum(l, 1e-30))
        p = (jnp.exp2(s - ml2 + bias) if bias is not None
             else jnp.exp2(s - ml2))  # [block_q, n_pad] f32
        delta = jnp.sum(do * o_ref[:, sl].astype(jnp.float32), axis=1,
                        keepdims=True)

        if dropout_rate > 0.0:
            if prng_chunk:
                keep = _prng_keep_block(block_q, n_pad, seed_ref[0],
                                        b * heads + h * hp + j,
                                        qb * block_q, prng_chunk,
                                        dropout_rate)
            else:
                keep = keep_mask(p.shape, seed_ref[0], dropout_rate,
                                 salt=b * heads + h * hp + j,
                                 row_offset=qb * block_q)
            p_drop = jnp.where(keep, p * inv_keep, 0.0)
        else:
            p_drop = p
        dv = jax.lax.dot_general(  # P~^T dO
            p_drop.astype(v.dtype), do.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(  # dO V^T
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dS = P * (dP - delta) with dP = keep/(1-q) * dPt expands to
        # P_drop * dPt - P * delta (P_drop = keep/(1-q) * P is already
        # computed for dV) — the separate masked-dP pass disappears and the
        # whole thing is one fused multiply-subtract over the N^2 block.
        if dropout_rate > 0.0:
            ds = (p_drop * dpt - p * delta).astype(q.dtype)
        else:
            ds = (p * (dpt - delta)).astype(q.dtype)  # [block_q, n_pad]
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)

        @pl.when(qb == 0)
        def _():
            dk_acc[:, sl] = dk
            dv_acc[:, sl] = dv

        @pl.when(qb > 0)
        def _():
            dk_acc[:, sl] = dk_acc[:, sl] + dk
            dv_acc[:, sl] = dv_acc[:, sl] + dv

        @pl.when(qb == nq - 1)
        def _():
            dk_ref[:, sl] = dk_acc[:, sl].astype(dk_ref.dtype)
            dv_ref[:, sl] = dv_acc[:, sl].astype(dv_ref.dtype)


def _mhsa_bwd_core(qkv, seed, o_fwd, ml, g, heads, dim_head, scale, n_true,
                   dropout_rate):
    """Shared Pallas backward -> (dq, dk, dv) as SEPARATE arrays, or None
    when the shape is degenerate (caller falls back to the XLA VJP)."""
    B, n_pad, three_inner = qkv.shape
    inner = three_inner // 3
    import os
    # Heads per program: with the per-head saved-stats layout, hp 2/4/6
    # measured a tie on v5e (2.78-2.79 ms/layer qkv+attn fwd+bwd at B8
    # vit-b16) — the 3.07 -> 2.78 win came from the (B, heads, n_pad, 2)
    # ml layout itself (the old lane-dim-2*hp layout read slow). Any
    # divisor of `heads` with a 128-multiple lane width is valid
    # (equivalence is tested); keep 2 as the widest-compatible default.
    hp = int(os.environ.get("GAVIKO_BWD_HP", "2"))
    if heads % hp != 0 or (hp * dim_head) % 128 != 0:
        hp = 2
    nh = heads // hp
    hd = hp * dim_head
    # Q-blocked: per program, ~3 (block_q, n_pad) f32 buffers + K/V/scratch.
    # Pick block_q so those stay within ~7 MB of the 16 MB VMEM. In prng
    # mode the env budget override is ignored: the forward already generated
    # bits at the default-geometry chunk granularity, and the backward must
    # block at a multiple of it to replay them.
    use_prng, prng_chunk = (_prng_plan(n_pad) if dropout_rate > 0.0
                            else (False, 0))
    bwd_budget = (_BWD_VMEM_DEFAULT if use_prng
                  else int(os.environ.get("GAVIKO_BWD_VMEM",
                                          str(_BWD_VMEM_DEFAULT))))
    block_q = _bwd_pick_block_q(n_pad, bwd_budget)
    # Degenerate-shape gate: fall back to the XLA VJP when even the smallest
    # q-block cannot keep the score buffers near VMEM. A budget above the
    # gate (the whole-K default) is honored by raising the Mosaic
    # scoped-VMEM limit to match — v5e has 128 MB behind the 32 MB
    # default limit.
    footprint = 3 * block_q * n_pad * 4
    if footprint > max(12_000_000, bwd_budget):  # degenerate shape: XLA VJP
        return None
    nq = n_pad // block_q

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((None, block_q, hd), lambda b, h, i: (b, i, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n_pad, hd), lambda b, h, i: (b, 0, nh + h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n_pad, hd), lambda b, h, i: (b, 0, 2 * nh + h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_q, hd), lambda b, h, i: (b, i, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_q, hd), lambda b, h, i: (b, i, h),
                     memory_space=pltpu.VMEM),  # forward output block
        pl.BlockSpec((None, hp, block_q, 2),
                     lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),  # saved (m, l) rows
    ]
    kv_out_spec = pl.BlockSpec((None, n_pad, hd), lambda b, h, i: (b, 0, h),
                               memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _fused_mhsa_bwd_kernel, scale=scale, n_true=n_true, hp=hp,
            dim_head=dim_head, heads=heads, dropout_rate=dropout_rate,
            prng_chunk=prng_chunk,
        ),
        grid=(B, nh, nq),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((None, block_q, hd), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            kv_out_spec,
            kv_out_spec,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, n_pad, inner), qkv.dtype) for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, hd), jnp.float32),
            pltpu.VMEM((n_pad, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": 100 * 1024 * 1024}
               if footprint > 10_000_000 else {}),
        ),
        interpret=_use_interpret(),
    )(seed, qkv, qkv, qkv, g, o_fwd, ml)
    return dq, dk, dv


def _fused_mhsa_bwd(heads, dim_head, scale, n_true, dropout_rate, res, g):
    qkv, seed, o_fwd, ml = res
    parts = _mhsa_bwd_core(qkv, seed, o_fwd, ml, g, heads, dim_head, scale,
                           n_true, dropout_rate)
    if parts is None:  # degenerate shape: XLA VJP
        return (
            _fused_mhsa_bwd_xla(qkv, seed, g, heads, dim_head, scale, n_true,
                                dropout_rate),
            _float0_like(seed),
        )
    dq, dk, dv = parts
    return (jnp.concatenate([dq, dk, dv], axis=-1), _float0_like(seed))


def mhsa_reference(qkv, seed, heads, dim_head, scale, n_true,
                   dropout_rate=0.0):
    """Pure-XLA forward with the SAME semantics (and, under dropout, the SAME
    hash-derived mask) as the fused kernel — the rematerialized backward and
    the CPU equivalence tests both build on it."""
    B, n_pad, three_inner = qkv.shape
    inner = three_inner // 3

    def to_heads(t):
        return t.reshape(B, n_pad, heads, dim_head).transpose(0, 2, 1, 3)

    q = to_heads(qkv[..., :inner])
    k = to_heads(qkv[..., inner:2 * inner])
    v = to_heads(qkv[..., 2 * inner:])
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if n_pad != n_true:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < n_true, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        salt = (jax.lax.broadcasted_iota(jnp.int32, (B, heads, 1, 1), 0) * heads
                + jax.lax.broadcasted_iota(jnp.int32, (B, heads, 1, 1), 1))
        keep = keep_mask(s.shape, seed[0], dropout_rate, salt=salt)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(B, n_pad, inner)


def _fused_mhsa_bwd_xla(qkv, seed, g, heads, dim_head, scale, n_true,
                        dropout_rate):
    _, vjp = jax.vjp(
        lambda t: mhsa_reference(t, seed, heads, dim_head, scale, n_true,
                                 dropout_rate),
        qkv,
    )
    return vjp(g)[0]


fused_mhsa.defvjp(_fused_mhsa_fwd, _fused_mhsa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def mhsa_qkv_proj(h, w, seed, heads: int, dim_head: int, scale: float,
                  n_true: int, dropout_rate: float = 0.0):
    """qkv projection + fused MHSA under ONE custom VJP.

    ``h``: LN output [B, N_pad, dim]; ``w``: packed qkv weight
    [3*heads*dim_head, dim] (torch layout). Forward = ``fused_mhsa(h @ w.T)``
    exactly. The point is the BACKWARD: with separate fused_mhsa + XLA GEMM
    VJPs, the [B, N_pad, 3*inner] dqkv cotangent must be PACKED from the
    kernel's separate dq/dk/dv outputs before the dW dot — XLA materializes
    that concat as AllocateBuffer + 3 dynamic-update-slices (~74 MB written
    and re-read per layer; measured 2.5 ms/step at vit-b16 B16, where the
    round-4 `concatenate`-grep audit missed the DUS form). Here the
    backward consumes dq/dk/dv directly:

        dh = dq @ Wq + dk @ Wk + dv @ Wv          (three K=dim dots)
        dW = [dq^T h ; dk^T h ; dv^T h]           (row-concat of [inner,dim]
                                                   blocks — 3.5 MB, trivial)

    so the big packed buffer never exists. Pad-row cotangents are zero by
    the same masking argument as fused_mhsa (pad keys carry zero
    probability; pooling never reads pad rows), so the dW row-sums are
    unaffected."""
    return _fused_mhsa_forward(h @ w.T, seed, heads, dim_head, scale,
                               n_true, dropout_rate)


def _mhsa_qkv_proj_fwd(h, w, seed, heads, dim_head, scale, n_true,
                       dropout_rate):
    qkv = h @ w.T
    out, ml = _fused_mhsa_forward(qkv, seed, heads, dim_head, scale, n_true,
                                  dropout_rate, emit_ml=True)
    return out, (h, w, qkv, seed, out, ml)


def _mhsa_qkv_proj_bwd(heads, dim_head, scale, n_true, dropout_rate, res, g):
    h, w, qkv, seed, o_fwd, ml = res
    inner = heads * dim_head
    parts = _mhsa_bwd_core(qkv, seed, o_fwd, ml, g, heads, dim_head, scale,
                           n_true, dropout_rate)
    if parts is None:  # degenerate shape: XLA VJP (packed dqkv is fine here)
        dqkv = _fused_mhsa_bwd_xla(qkv, seed, g, heads, dim_head, scale,
                                   n_true, dropout_rate)
        parts = (dqkv[..., :inner], dqkv[..., inner:2 * inner],
                 dqkv[..., 2 * inner:])
    dq, dk, dv = parts
    B, n_pad, dim = h.shape
    h2 = h.reshape(B * n_pad, dim)
    f32 = jnp.float32

    def flat(t):
        return t.reshape(B * n_pad, inner)

    dh = None
    dws = []
    for dpart, row0 in ((dq, 0), (dk, inner), (dv, 2 * inner)):
        dp = flat(dpart)
        wpart = jax.lax.slice_in_dim(w, row0, row0 + inner, axis=0)
        term = jax.lax.dot_general(
            dp, wpart, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        dh = term if dh is None else dh + term
        dws.append(jax.lax.dot_general(
            dp, h2, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(w.dtype))
    dh = dh.astype(h.dtype).reshape(B, n_pad, dim)
    dw = jnp.concatenate(dws, axis=0)
    return dh, dw, _float0_like(seed)


mhsa_qkv_proj.defvjp(_mhsa_qkv_proj_fwd, _mhsa_qkv_proj_bwd)


# ---------------------------------------------------------------------------
# Masked local attention (GAViKO 3D window), single head
# ---------------------------------------------------------------------------

def _local_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                  scale, DHW, local_k, n_true, dropout_rate):
    """Whole-K local attention; 3D-window additive mask evaluated inline.

    Window predicate per axis (q at (d,h,w), key at (d2,h2,w2), window k):
    delta = key - query in [-(k // 2), k - 1 - k // 2] — the closed form of
    the reference's padded-loop + crop arithmetic (gaviko.py:218-227),
    asymmetric for even k.
    """
    block_q = q_ref.shape[0]
    n_pad = k_ref.shape[0]
    D, H, W = DHW
    kd, kh, kw = local_k
    qb = pl.program_id(1)

    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    row = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_pad), 1)
    q_d, q_h, q_w = row // (H * W), (row // W) % H, row % W
    k_d, k_h, k_w = col // (H * W), (col // W) % H, col % W
    ok = (
        (k_d - q_d >= -(kd // 2)) & (k_d - q_d <= kd - 1 - kd // 2)
        & (k_h - q_h >= -(kh // 2)) & (k_h - q_h <= kh - 1 - kh // 2)
        & (k_w - q_w >= -(kw // 2)) & (k_w - q_w <= kw - 1 - kw // 2)
        & (col < n_true)
    )
    s = jnp.where(ok, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    # Padded q rows have no valid key at all; keep exp() finite there.
    m_safe = jnp.where(m == NEG_INF, 0.0, m)
    p = jnp.where(ok, jnp.exp(s - m_safe), 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    scale_out = 1.0
    if dropout_rate > 0.0:
        # softmax -> dropout -> PV (ref applies nn.Dropout on the local
        # attention probabilities too, gaviko.py:235-243).
        keep = keep_mask(p.shape, seed_ref[0], dropout_rate,
                         salt=pl.program_id(0), row_offset=qb * block_q)
        p = jnp.where(keep, p, 0.0)
        scale_out = 1.0 / (1.0 - dropout_rate)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o * scale_out / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_local_attention(q, k, v, seed, scale: float,
                          DHW: Tuple[int, int, int],
                          local_k: Tuple[int, int, int],
                          dropout_rate: float = 0.0):
    """Single-head local attention: q, k, v [B, N, dl], N == prod(DHW).
    ``seed``: (1,) int32 hash-dropout seed (ignored when dropout_rate == 0)."""
    return _local_forward(q, k, v, seed, scale, DHW, local_k, dropout_rate)


def _local_forward(q, k, v, seed, scale, DHW, local_k, dropout_rate):
    B, N, dl = q.shape
    block_q = _round_up(N, 8)
    while block_q * _round_up(N, 8) * 4 > 4_500_000 and block_q % 2 == 0:
        block_q //= 2
    n_pad = _round_up(N, block_q)
    if n_pad != N:
        pad = [(0, 0), (0, n_pad - N), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    out = pl.pallas_call(
        functools.partial(
            _local_kernel, scale=scale, DHW=tuple(DHW),
            local_k=tuple(local_k), n_true=N, dropout_rate=dropout_rate,
        ),
        grid=(B, n_pad // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block_q, dl), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_pad, dl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_pad, dl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, dl), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, dl), q.dtype),
        interpret=_use_interpret(),
    )(seed, q, k, v)
    return out[:, :N, :] if n_pad != N else out


def _local_fwd(q, k, v, seed, scale, DHW, local_k, dropout_rate):
    out = _local_forward(q, k, v, seed, scale, DHW, local_k, dropout_rate)
    return out, (q, k, v, seed)


def local_reference(q, k, v, seed, scale, DHW, local_k, dropout_rate=0.0):
    """Pure-XLA forward matching the kernel bit-for-bit under dropout
    (same hash mask); used by the rematerialized backward and CPU tests."""
    from gaviko_tpu.ops.local_attention import local_mask_additive

    mask = local_mask_additive(DHW, local_k)
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32) * scale + mask
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        B = q.shape[0]
        salt = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0)
        keep = keep_mask(s.shape, seed[0], dropout_rate, salt=salt)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    return jnp.einsum("bnm,bmd->bnd", p.astype(v.dtype), v)


def _local_bwd(scale, DHW, local_k, dropout_rate, res, g):
    q, k, v, seed = res
    _, vjp = jax.vjp(
        lambda q, k, v: local_reference(q, k, v, seed, scale, DHW, local_k,
                                        dropout_rate),
        q, k, v,
    )
    return (*vjp(g), _float0_like(seed))


flash_local_attention.defvjp(_local_fwd, _local_bwd)
