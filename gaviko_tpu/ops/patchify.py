"""Pallas patchify-embed kernel: non-overlapping 3D conv as VMEM gather + GEMM.

The reference's Conv3d(kernel == stride) patch embed (vision_transformer.py:
126-128) is a pure patch-gather + matmul. XLA's lowerings are all bad on TPU
for this shape: the 8D-transpose path costs ~5 ms per batch-8 forward (8x
HBM roofline — the transpose interleaves 16-element lane fragments), and
conv_general_dilated is 13-15 ms in either layout. This kernel keeps the
interleave inside VMEM using only Mosaic-supported ops:

1. collapse (pd, ph) leading dims (contiguous reshape),
2. permute lanes W=(gw,pw) -> (pw,gw) with a 160x160 permutation MATMUL
   (lane shuffles are free on the MXU, illegal as a vector shape cast),
3. one 2D transpose -> rows (pw, gw),
4. static strided copies into a scratch laid out rows=(pw, gh, gw),
5. per-pw GEMM accumulation against per-pw weight slices.

Column order of each GEMM is (pd, ph); the weight tensor is pre-arranged to
(pw, pd*ph, dim) outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kpad(kdim: int) -> int:
    """Stripe width for one pw phase's (pd*ph) patch columns.

    Default: exact kdim when it is a sublane multiple — the stripe copies
    then land at static (unaligned) lane offsets, which Mosaic lowers with
    masked shifts, and the embedding GEMM's K dim carries no dead columns
    (kdim 192 padded to 256 wasted 25% of the GEMM). Set GAVIKO_KPAD128=1
    to restore 128-aligned stripes for A/B measurement."""
    import os
    if os.environ.get("GAVIKO_KPAD128") == "1" or kdim % 8 != 0:
        return ((kdim + 127) // 128) * 128
    return kdim


def _patchify_kernel(x_ref, w_ref, b_ref, perm_ref, pos_ref, o_ref, *rest,
                     gd, gh, gw, ph, pw, pd, kpad, save_rows=False):
    # x_ref: (pd, H, W) slab for grid step (b, d); rows_ref scratch holds the
    # WHOLE volume's gathered rows (gd*gh*gw, pw*kpad): each pw owns a
    # kpad-wide (128-aligned) column stripe with its pd*ph patch columns
    # (stripe tails are dead — the matching w_ref rows are 0). The embedding
    # GEMM runs ONCE per batch item on the last d step: M = gd*gh*gw rows
    # keeps the MXU ~85% utilized vs ~36% at M = gh*gw (measured).
    #
    # v4: all gh groups stack (kpad-padded) into ONE (gh*kpad, W) operand so
    # the lane permutation runs as a single (W, W) x (W, gh*kpad) dot —
    # amortizing the latency that made gh separate (W, kdim) dots the
    # bottleneck of v3 — and the stripe copies below land at 128-aligned
    # lane offsets with their zero tails already in place.
    if save_rows:
        rows_out_ref, rows_ref = rest
    else:
        (rows_ref,) = rest
    d = pl.program_id(1)
    kdim = pd * ph
    z = jnp.concatenate([
        jnp.pad(
            x_ref[:, g * ph:(g + 1) * ph, :].reshape(kdim, gw * pw),
            [(0, kpad - kdim), (0, 0)],
        ) for g in range(gh)
    ], axis=0)                                         # (gh*kpad, W)
    zt = jax.lax.dot_general(
        perm_ref[:], z, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(z.dtype)                                  # (W=(pw,gw), gh*kpad)
    for g in range(gh):
        for q in range(pw):
            # d indexes the scratch's LEADING (untiled) dim — dynamic there
            # carries no sublane-alignment proof obligation; g/q offsets
            # are static and 128-aligned on the lane dim.
            rows_ref[d, g * gw:(g + 1) * gw, q * kpad:(q + 1) * kpad] = \
                zt[q * gw:(q + 1) * gw, g * kpad:(g + 1) * kpad]
    if save_rows:
        # Emit this depth slab's gathered rows (the patch matrix) so the
        # backward's dW is one GEMM instead of an 8D-transpose recompute.
        rows_out_ref[...] = rows_ref[d]

    @pl.when(d == gd - 1)
    def _():
        # Stacked GEMM over every pw stripe and every depth slab at once,
        # with the (token) positional embedding added in the epilogue.
        rows = jnp.concatenate([rows_ref[d2] for d2 in range(gd)], axis=0)
        y = jax.lax.dot_general(
            rows, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (y + pos_ref[:].astype(jnp.float32)).astype(o_ref.dtype) \
            + b_ref[:]


def patchify_supported(spec) -> bool:
    return spec.channels == 1


@functools.lru_cache(maxsize=4)
def _perm_matrix(gw: int, pw: int) -> np.ndarray:
    """(W, W) permutation: column (q*gw + g) selects input lane (g*pw + q)."""
    W = gw * pw
    P = np.zeros((W, W), np.float32)
    for g in range(gw):
        for q in range(pw):
            P[g * pw + q, q * gw + g] = 1.0
    return P


def _patchify_reference(img, weight, bias, pos, spec):
    """XLA reshape-path reference (used for the VJP and CPU checks)."""
    B, C, D, H, W = img.shape
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    gd, gh, gw = D // pd, H // ph, W // pw
    x = img.reshape(B, C, gd, pd, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, gd * gh * gw, -1)
    y = jnp.einsum(
        "bnk,dk->bnd", x, weight.reshape(weight.shape[0], -1),
        preferred_element_type=jnp.float32,
    )
    return (y + pos.astype(jnp.float32)).astype(img.dtype) + bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def patchify_fused(img, weight, bias, pos, spec):
    """Differentiable wrapper: Pallas forward + one-GEMM backward.

    The forward emits the gathered patch matrix (``rows``) as a second
    kernel output, so dW is a single (pw*kpad, tokens) x (tokens, dim) GEMM
    instead of re-deriving patches through XLA's 8D-transpose path (~5 ms
    per batch-8 — it dominated the train step's patchify backward).
    ``pos``: (N, dim) positional-embedding rows added in the GEMM epilogue
    (pass zeros to skip)."""
    return patchify_pallas(img, weight, bias, pos, spec)


def _patchify_fwd(img, weight, bias, pos, spec):
    out, rows = patchify_pallas(img, weight, bias, pos, spec, save_rows=True)
    return out, (img, weight, bias, pos, rows)


def _patchify_bwd(spec, res, g):
    img, weight, bias, pos, rows = res
    B, C, D, H, W = img.shape
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    dim = weight.shape[0]
    kdim = pd * ph
    kpad = _kpad(kdim)
    n_tok = rows.shape[1] * rows.shape[2]
    gf = g.reshape(B * n_tok, dim)
    rf = rows.reshape(B * n_tok, pw * kpad)
    # (pw*kpad, dim) stripe-packed weight grad; stripe tails hit the rows'
    # zero columns, so slicing them off loses nothing.
    dw2 = jax.lax.dot_general(
        rf, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw4 = jnp.stack([
        dw2[q * kpad:q * kpad + kdim].reshape(pd, ph, dim)
        for q in range(pw)
    ], axis=2)  # (pd, ph, pw, dim)
    dweight = dw4.transpose(3, 0, 1, 2)[:, None].astype(weight.dtype)
    dpos = g.astype(jnp.float32).sum(axis=0)
    # Same reduction, reordered: summing the (N, dim) dpos over N avoids a
    # second full pass over the (B, N, dim) cotangent.
    dbias = dpos.sum(axis=0)
    # dImg is only ever requested when someone differentiates w.r.t. the
    # volume (never in training); build it from the XLA reference so the
    # whole branch DCEs away when its cotangent is unused.
    _, img_vjp = jax.vjp(
        lambda i: _patchify_reference(
            i, weight, jnp.zeros((dim,), img.dtype),
            jnp.zeros_like(dpos, img.dtype), spec),
        img)
    return (img_vjp(g)[0], dweight, dbias.astype(bias.dtype),
            dpos.astype(pos.dtype))


patchify_fused.defvjp(_patchify_fwd, _patchify_bwd)


def patchify_pallas(img: jax.Array, weight: jax.Array, bias: jax.Array,
                    pos: jax.Array, spec, save_rows: bool = False):
    """img [B, 1, D, H, W], weight (dim, 1, pd, ph, pw), pos (N, dim)
    -> [B, N, dim] tokens (+ pos).

    ``save_rows=True`` additionally returns the gathered patch matrix
    (B, gd, gh*gw, pw*kpad) — the kernel's rows scratch, emitted per depth
    slab — for the one-GEMM dW backward."""
    B, C, D, H, W = img.shape
    pd = spec.frame_patch_size
    ph, pw = spec.image_patch_size
    gd, gh, gw = D // pd, H // ph, W // pw
    dim = weight.shape[0]
    kdim = pd * ph
    kpad = _kpad(kdim)
    # (dim, pd, ph, pw) -> stacked (pw*kpad, dim): stripe q holds the
    # (pd, ph) weight slice for lane phase q; stripe tails stay zero so the
    # kernel's dead scratch columns contribute nothing.
    w4 = weight[:, 0].astype(img.dtype)  # (dim, pd, ph, pw)
    w2 = jnp.concatenate([
        jnp.pad(w4[:, :, :, q].reshape(dim, kdim).T,
                [(0, kpad - kdim), (0, 0)])
        for q in range(pw)
    ], axis=0)  # (pw*kpad, dim); loop-invariant, hoisted by XLA under jit
    b2 = bias.reshape(1, dim).astype(img.dtype)
    perm = jnp.asarray(_perm_matrix(gw, pw).T, img.dtype)

    # Index the 5D volume directly: a pd-sized block on the D axis gives the
    # kernel the same (pd, H, W) slab WITHOUT a host-side reshape. (A reshape
    # to (B, gd, pd, H, W) made XLA's layout assignment route the whole
    # 196 MB input through a physically-no-op layout-permuting copy —
    # 0.84 ms per B32 batch — just to make the reshape a formal bitcast.)
    n_tok = gd * gh * gw
    out_specs = [pl.BlockSpec((None, n_tok, dim), lambda b, d: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, n_tok, dim), img.dtype)]
    if save_rows:
        out_specs.append(
            pl.BlockSpec((None, None, gh * gw, pw * kpad),
                         lambda b, d: (b, d, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((B, gd, gh * gw, pw * kpad), img.dtype))
    res = pl.pallas_call(
        functools.partial(_patchify_kernel, gd=gd, gh=gh, gw=gw, ph=ph, pw=pw,
                          pd=pd, kpad=kpad, save_rows=save_rows),
        grid=(B, gd),
        in_specs=[
            pl.BlockSpec((None, None, pd, H, W), lambda b, d: (b, 0, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pw * kpad, dim), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tok, dim), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((gd, gh * gw, pw * kpad), img.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(img, w2, b2, perm, pos.astype(img.dtype))
    return tuple(res) if save_rows else res[0]
