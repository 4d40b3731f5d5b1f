"""Pallas fused transformer MLP: LN -> fc1 -> GELU -> fc2 in one kernel.

XLA materializes the (tokens, mlp_dim) hidden activation in HBM between fc1
and fc2 (~400 MB round trip per vit-b16 layer at batch 32). This kernel
keeps both weight matrices resident in VMEM and streams row blocks, so the
hidden exists only as a VMEM block.

Weights are consumed in the torch (out, in) storage layout directly: the
MXU contracts transposed operands natively, so no transposed copy ever
materializes (with updating params that copy would re-run every step).

Training (with in-kernel hash dropout) runs fused too: the backward is a
row-blocked Pallas kernel (``_mlp_bwd_kernel``) that consumes the
forward-SAVED pre-GELU hidden (the fc1 recompute dot is gone; only the
cheap LN is recomputed per chunk) and replays the dropout masks from (seed,
absolute coordinates) — engaged whenever ``_mlp_bwd_supported`` passes
(weights + f32 weight-grad accumulators fit VMEM, i.e. vit-b16 and
smaller). Larger geometries fall back to a rematerialized XLA VJP over
``mlp_reference`` with identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaviko_tpu.ops._blocks import row_block
from gaviko_tpu.ops.hash_dropout import apply_dropout, keep_mask


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def erf_f32(x):
    """float32 erf via Abramowitz & Stegun 7.1.26 (max abs err ~2.5e-6 in f32).

    Mosaic cannot lower lax.erf/lax.erfc inside TPU kernels (this jax
    version's jax.nn.gelu(approximate=False) emits erfc), so exact-GELU
    kernels spell erf with this exp-based rational approximation. The 2.5e-6
    error is ~2 decades below the framework's 1e-4 logit-parity budget.
    """
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def gelu_exact_f32(x):
    """Exact (erf-form) GELU on f32 inputs, safe inside Pallas TPU kernels."""
    return x * 0.5 * (1.0 + erf_f32(x * 0.7071067811865476))


# erf ~= sign(a) * tanh(C1|a| + C3|a|^3 + C5|a|^5): GELU-weighted minimax fit
# (max |GELU err| 5.5e-5 absolute; measured full-depth vit-b16 fp32 logit
# MAE vs true erf: 2.2e-6 — 50x under the 1e-4 parity budget). One tanh +
# 3 FMA replaces A&S's divide + 5-term poly + exp: the cheaper exact-erf
# deployment mode (model.gelu: erf_fast).
_EF_C1 = 1.1281153655981508
_EF_C3 = 0.1041330662360045
_EF_C5 = -0.0017956401545075685


def erf_fast_f32(x):
    a = jnp.abs(x)
    a2 = a * a
    p = a * (_EF_C1 + a2 * (_EF_C3 + a2 * _EF_C5))
    return jnp.sign(x) * jnp.tanh(p)


def gelu_erf_fast_f32(x):
    return x * 0.5 * (1.0 + erf_fast_f32(x * 0.7071067811865476))


def _gelu_erf_fast_grad_f32(x):
    """d/dx of the erf_fast GELU — the derivative OF THE APPROXIMATION
    (consistent VJP), which is also cheaper than the exact-phi form."""
    a = x * 0.7071067811865476
    aa = jnp.abs(a)
    a2 = aa * aa
    p = aa * (_EF_C1 + a2 * (_EF_C3 + a2 * _EF_C5))
    t = jnp.tanh(p)
    e = jnp.sign(a) * t
    dp = _EF_C1 + a2 * (3.0 * _EF_C3 + a2 * (5.0 * _EF_C5))
    # e = sign(a) tanh(p(|a|)) is odd and smooth: de/da = (1-t^2) dp for
    # all a by symmetry.
    return 0.5 * (1.0 + e) + x * 0.5 * (1.0 - t * t) * dp * 0.7071067811865476


def gelu_mode(gelu) -> str:
    """Normalize the threaded gelu flag: legacy bools (True='tanh') and the
    spec strings 'exact' | 'tanh' | 'erf_fast' all map to a mode string."""
    if gelu is True:
        return "tanh"
    if gelu is False or gelu is None:
        return "exact"
    return str(gelu)


def gelu_by_mode(h, gelu):
    """Forward GELU by mode, Pallas-safe (no lax.erf for 'exact')."""
    mode = gelu_mode(gelu)
    if mode == "tanh":
        return jax.nn.gelu(h, approximate=True)
    if mode == "erf_fast":
        return gelu_erf_fast_f32(h)
    return gelu_exact_f32(h)


def _mlp_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                *refs, eps, approximate, dropout_rate, residual,
                save_a=False):
    """Grid = (row_blocks, mlp_chunks). The hidden dim streams in chunks so
    weight slices fit VMEM even for vit-l16 (dim 1024, mlp 4096); partial
    fc2 products accumulate in an f32 scratch, written out on the last
    chunk. LN is recomputed per chunk (cheap relative to the GEMMs).

    Training dropout (ref FeedForward: LN->fc1->GELU->Drop->fc2->Drop,
    vision_transformer.py:26-38) replays hash bits addressed by (global flat
    row, feature column): salt 0 for the hidden site, salt 1 for the output
    site — the XLA backward reconstructs identical masks."""
    if save_a:
        o_ref, a_ref, acc_ref = refs
    else:
        o_ref, acc_ref = refs
    i, j = pl.program_id(0), pl.program_id(1)
    nj = pl.num_programs(1)
    block = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)
    h = h * g_ref[:] + b_ref[:]
    h = jax.lax.dot_general(
        h, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    if save_a:
        # Emit the pre-GELU hidden: the Pallas backward then skips its
        # recompute of the (block, mlp) fc1 dot — the extra dot of the
        # 5-GEMM backward — and re-derives gelu/dropout from `a` directly.
        a_ref[:] = h.astype(a_ref.dtype)
    h = gelu_by_mode(h, approximate)
    if dropout_rate > 0.0:
        h = apply_dropout(h, seed_ref[0], dropout_rate, salt=0,
                          row_offset=i * block,
                          col_offset=j * w1_ref.shape[0])
    h = h.astype(o_ref.dtype)
    part = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part + b2_ref[:].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == nj - 1)
    def _():
        out = acc_ref[:]
        if dropout_rate > 0.0:
            out = apply_dropout(out, seed_ref[0], dropout_rate, salt=1,
                                row_offset=i * block)
        if residual:
            # The caller's `branch + x` residual fused in (the x block is
            # already resident); saves one 3-tensor HBM pass per layer.
            out = out + x_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


# v5e has 128 MB of VMEM behind a 32 MB default Mosaic limit (see
# ARCHITECTURE.md), so vit-l16's 16.8 MB weight pair DOES fit unchunked —
# but measured end-to-end it LOSES to XLA's unfused path at that geometry
# (GAViKO vit-l16 B8: 169.5 vol/s unfused vs 160.9 fused; shallow row-block
# pipelines amortize the big resident weights poorly). The budget therefore
# gates fusion to vit-b16-and-smaller weight pairs, where it wins.
_WEIGHT_VMEM_BUDGET = 12_000_000
_VMEM_LIMIT = 100 * 1024 * 1024


def _chunk_plan(dim: int, mlp_dim: int, itemsize: int):
    """-> chunk size (divisor of mlp_dim, multiple of 128) fitting VMEM."""
    chunk = mlp_dim
    while 2 * dim * chunk * itemsize > _WEIGHT_VMEM_BUDGET:
        if chunk % 2 or (chunk // 2) % 128:
            return None
        chunk //= 2
    return chunk


def fused_mlp_supported(dim: int, mlp_dim: int, dtype) -> bool:
    # Chunked accumulation (weights > VMEM, e.g. vit-l16) measured SLOWER
    # than XLA's unfused path end-to-end, so fusion is only claimed when the
    # full weight pair fits (nj == 1).
    itemsize = jnp.dtype(dtype).itemsize
    return (
        dim % 128 == 0 and mlp_dim % 128 == 0
        and _chunk_plan(dim, mlp_dim, itemsize) == mlp_dim
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_mlp(x, gamma, beta, w1, b1, w2, b2, seed, eps: float,
              approximate: bool, dropout_rate: float = 0.0,
              residual: bool = False):
    """x: [B, N, dim]; w1: (mlp, dim), w2: (dim, mlp) TORCH layout.
    ``seed``: (1,) int32 hash-dropout seed (ignored when dropout_rate == 0).
    ``residual=True`` returns x + branch instead of the branch alone."""
    return _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps,
                              approximate, dropout_rate, residual)


def _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
                       dropout_rate, residual=False, save_a=False):
    B, N, dim = x.shape
    mlp_dim = w1.shape[0]
    rows = B * N
    # Row-block size, measured in-model on chip (round 3): 256 wins at
    # train-step row counts (B8, rows 8064: block 512 regressed 45.9 ->
    # 47.6 ms/step) while 512 wins at serving row counts (B32, rows 32256:
    # 45.62 -> 45.40 ms/fwd) — deeper row pipelines amortize the weight
    # residency only once the grid is long enough. 1008 regressed either
    # way (isolated-lab wins did not transfer).
    block = row_block(rows, "GAVIKO_MLP_BLOCK")
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, dim)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
    chunk = _chunk_plan(dim, mlp_dim, jnp.dtype(x.dtype).itemsize)
    nj = mlp_dim // chunk
    out_specs = [pl.BlockSpec((block, dim), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, dim), x.dtype)]
    if save_a:
        out_specs.append(pl.BlockSpec((block, chunk), lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, mlp_dim), x.dtype))
    res = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, approximate=approximate,
                          dropout_rate=dropout_rate, residual=residual,
                          save_a=save_a),
        grid=(n_pad // block, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if save_a else out_specs[0],
        out_shape=tuple(out_shapes) if save_a else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((block, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(seed, xf, gamma.reshape(1, dim), beta.reshape(1, dim), w1,
      b1.reshape(1, mlp_dim), w2, b2.reshape(1, dim))
    if save_a:
        out, a = res
        return out[:rows].reshape(B, N, dim), a
    return res[:rows].reshape(B, N, dim)


def _fused_mlp_fwd(x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
                   dropout_rate, residual):
    dim, mlp_dim = x.shape[-1], w1.shape[0]
    if _mlp_bwd_supported(dim, mlp_dim, jnp.dtype(x.dtype).itemsize):
        out, a = _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps,
                                    approximate, dropout_rate, residual,
                                    save_a=True)
        return out, (x, gamma, beta, w1, b1, w2, b2, seed, a)
    return (
        _fused_mlp_forward(x, gamma, beta, w1, b1, w2, b2, seed, eps,
                           approximate, dropout_rate, residual),
        (x, gamma, beta, w1, b1, w2, b2, seed, None),
    )


def mlp_reference(x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
                  dropout_rate=0.0, residual=False):
    """Pure-XLA forward matching the kernel (same hash masks under dropout);
    backs the rematerialized VJP and the CPU equivalence tests."""
    from gaviko_tpu.ops.hash_dropout import keep_mask

    B, N, dim = x.shape
    mlp_dim = w1.shape[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    h = h * gamma + beta
    h = (h @ w1.T + b1.astype(jnp.float32))
    h = gelu_by_mode(h, approximate)
    if dropout_rate > 0.0:
        inv = 1.0 / (1.0 - dropout_rate)
        keep_h = keep_mask((B * N, mlp_dim), seed[0], dropout_rate,
                           salt=0).reshape(B, N, mlp_dim)
        h = jnp.where(keep_h, h * inv, 0.0)
    h = h.astype(x.dtype)
    out = h @ w2.T + b2.astype(jnp.float32)
    if dropout_rate > 0.0:
        keep_o = keep_mask((B * N, dim), seed[0], dropout_rate,
                           salt=1).reshape(B, N, dim)
        out = jnp.where(keep_o, out * inv, 0.0)
    if residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


def _gelu_grad_f32(a, approximate):
    """d/da GELU(a) in f32, Mosaic-safe (no lax.erf)."""
    mode = gelu_mode(approximate)
    if mode == "tanh":
        c = 0.7978845608028654  # sqrt(2/pi)
        u = c * (a + 0.044715 * a * a * a)
        t = jnp.tanh(u)
        du = c * (1.0 + 3.0 * 0.044715 * a * a)
        return 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * du
    if mode == "erf_fast":
        return _gelu_erf_fast_grad_f32(a)
    phi = jnp.exp(-0.5 * a * a) * 0.3989422804014327  # N(0,1) pdf
    return 0.5 * (1.0 + erf_f32(a * 0.7071067811865476)) + a * phi


def _mlp_bwd_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                    dy_ref, a_ref, dx_ref, dg_ref, db_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref,
                    dw1_acc, db1_acc, dw2_acc, db2_acc, dg_acc, db_acc, *,
                    eps, approximate, dropout_rate, residual):
    """Row-blocked MLP backward with the hidden kept in VMEM.

    The XLA rematerialized VJP round-trips the (rows, mlp) hidden through
    HBM ~4x per layer (a, gelu(a), dg, da); here everything between the
    GEMMs lives in registers/VMEM. Weight/bias/LN grads accumulate in f32
    scratch across the sequential row grid and are written on the last
    block. Dropout masks are REPLAYED from (seed, absolute coordinates) —
    identical bits to the forward kernel.
    """
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    block = x_ref.shape[0]
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    # Recompute the LN (VPU-only, cheap); the pre-GELU hidden `a` comes in
    # SAVED from the forward kernel, so the fc1 recompute dot — one of the
    # backward's five (block, mlp)-scale GEMMs — is gone.
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    h = (xhat.astype(x_ref.dtype) * g_ref[:] + b_ref[:])
    a = a_ref[:].astype(jnp.float32)
    gact = gelu_by_mode(a, approximate)
    if dropout_rate > 0.0:
        keep1 = keep_mask(gact.shape, seed_ref[0], dropout_rate, salt=0,
                          row_offset=i * block)
        gdrop = jnp.where(keep1, gact * inv, 0.0)
    else:
        gdrop = gact

    dout = dy_ref[:].astype(jnp.float32)
    dx_res = dout if residual else 0.0
    if dropout_rate > 0.0:
        keep2 = keep_mask(dout.shape, seed_ref[0], dropout_rate, salt=1,
                          row_offset=i * block)
        dout = jnp.where(keep2, dout * inv, 0.0)
    db2 = jnp.sum(dout, axis=0, keepdims=True)
    gdrop16 = gdrop.astype(x_ref.dtype)
    dout16 = dout.astype(x_ref.dtype)
    dw2 = jax.lax.dot_general(  # (dim, mlp) = dout^T @ gdrop
        dout16, gdrop16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = jax.lax.dot_general(  # (block, mlp) = dout @ w2
        dout16, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        dg = jnp.where(keep1, dg * inv, 0.0)
    da = dg * _gelu_grad_f32(a, approximate)
    da16 = da.astype(x_ref.dtype)
    db1 = jnp.sum(da, axis=0, keepdims=True)
    dw1 = jax.lax.dot_general(  # (mlp, dim) = da^T @ h
        da16, h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jax.lax.dot_general(  # (block, dim) = da @ w1
        da16, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgamma = jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2) + dx_res
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_acc[:] = dw1
        db1_acc[:] = db1
        dw2_acc[:] = dw2
        db2_acc[:] = db2
        dg_acc[:] = dgamma
        db_acc[:] = dbeta

    @pl.when(i > 0)
    def _():
        dw1_acc[:] = dw1_acc[:] + dw1
        db1_acc[:] = db1_acc[:] + db1
        dw2_acc[:] = dw2_acc[:] + dw2
        db2_acc[:] = db2_acc[:] + db2
        dg_acc[:] = dg_acc[:] + dgamma
        db_acc[:] = db_acc[:] + dbeta

    @pl.when(i == ni - 1)
    def _():
        dw1_ref[:] = dw1_acc[:].astype(dw1_ref.dtype)
        db1_ref[:] = db1_acc[:].astype(db1_ref.dtype)
        dw2_ref[:] = dw2_acc[:].astype(dw2_ref.dtype)
        db2_ref[:] = db2_acc[:].astype(db2_ref.dtype)
        dg_ref[:] = dg_acc[:].astype(dg_ref.dtype)
        db_ref[:] = db_acc[:].astype(db_ref.dtype)


def _mlp_bwd_pallas(x, gamma, beta, w1, b1, w2, b2, seed, g, a, eps,
                    approximate, dropout_rate, residual):
    B, N, dim = x.shape
    mlp_dim = w1.shape[0]
    rows = B * N
    block = row_block(rows, "GAVIKO_MLP_BLOCK")
    n_pad = ((rows + block - 1) // block) * block
    xf = x.reshape(rows, dim)
    gf = g.reshape(rows, dim)
    if n_pad != rows:
        xf = jnp.pad(xf, [(0, n_pad - rows), (0, 0)])
        gf = jnp.pad(gf, [(0, n_pad - rows), (0, 0)])
    # `a` is already (n_pad, mlp_dim) from the forward kernel.
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, approximate=approximate,
                          dropout_rate=dropout_rate, residual=residual),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(1, dim), full(1, dim),
            full(mlp_dim, dim), full(1, mlp_dim), full(dim, mlp_dim),
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, mlp_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(1, dim), full(1, dim),
            full(mlp_dim, dim), full(1, mlp_dim),
            full(dim, mlp_dim), full(1, dim),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, dim), x.dtype),
            jax.ShapeDtypeStruct((1, dim), gamma.dtype),
            jax.ShapeDtypeStruct((1, dim), beta.dtype),
            jax.ShapeDtypeStruct((mlp_dim, dim), w1.dtype),
            jax.ShapeDtypeStruct((1, mlp_dim), b1.dtype),
            jax.ShapeDtypeStruct((dim, mlp_dim), w2.dtype),
            jax.ShapeDtypeStruct((1, dim), b2.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((mlp_dim, dim), jnp.float32),
            pltpu.VMEM((1, mlp_dim), jnp.float32),
            pltpu.VMEM((dim, mlp_dim), jnp.float32),
            pltpu.VMEM((1, dim), jnp.float32),
            pltpu.VMEM((1, dim), jnp.float32),
            pltpu.VMEM((1, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_use_interpret(),
    )(seed, xf, gamma.reshape(1, dim), beta.reshape(1, dim),
      w1, b1.reshape(1, mlp_dim), w2, gf, a)
    dx, dgamma, dbeta, dw1, db1, dw2, db2 = outs
    return (
        dx[:rows].reshape(B, N, dim),
        dgamma.reshape(gamma.shape),
        dbeta.reshape(beta.shape),
        dw1, db1.reshape(b1.shape), dw2, db2.reshape(b2.shape),
    )


def _mlp_bwd_supported(dim, mlp_dim, itemsize):
    # Full weights + two f32 weight-grad accumulators resident.
    return (
        dim % 128 == 0 and mlp_dim % 128 == 0
        and 2 * dim * mlp_dim * (itemsize + 4) <= 60_000_000
    )


def _fused_mlp_bwd(eps, approximate, dropout_rate, residual, res, g):
    import numpy as np

    x, gamma, beta, w1, b1, w2, b2, seed, a = res
    dim, mlp_dim = x.shape[-1], w1.shape[0]
    if a is not None and _mlp_bwd_supported(dim, mlp_dim,
                                            jnp.dtype(x.dtype).itemsize):
        grads = _mlp_bwd_pallas(x, gamma, beta, w1, b1, w2, b2, seed, g, a,
                                eps, approximate, dropout_rate, residual)
        return (*grads, np.zeros(seed.shape, dtype=jax.dtypes.float0))
    _, vjp = jax.vjp(
        lambda x, gamma, beta, w1, b1, w2, b2: mlp_reference(
            x, gamma, beta, w1, b1, w2, b2, seed, eps, approximate,
            dropout_rate, residual,
        ),
        x, gamma, beta, w1, b1, w2, b2,
    )
    return (*vjp(g), np.zeros(seed.shape, dtype=jax.dtypes.float0))


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
