"""Differentiable multi-mode softmax probs: Pallas forward + closed-form XLA
backward — the training-side flash attention for the f2 and intra sites
(VERDICT r2 missing #4).

The f2/intra attention sites previously trained through a remat'd XLA
softmax: the forward materializes fp32 [B, M, U, U] scores plus exp/sum
temporaries, and the remat'd backward recomputes ALL of it before the
softmax VJP.  This op runs the blockwise Pallas probs kernel forward (the
only [B, M, U, U]-sized tensor that ever exists is the out-dtype probs, the
module's actual output) and a backward that starts FROM the saved probs:

    c   = q k^T / sqrt(md)
    l   = clamp(c, +-clip_val) + pos_w * Bias        (clamp BEFORE bias,
                                                      reference setrans.py:520-540)
    p   = softmax_row(l)
    dl  = p * (g - sum_j(g * p))                     (softmax VJP)
    dc  = dl * 1[|c| < clip_val]                     (conditional-clamp mask)
    dq  = dc @ k / sqrt(md);   dk = dc^T @ q / sqrt(md)
    dB  = pos_w * sliding-diagonal-sums(dl)          (structured window)
        | pos_w * sum_{b,m}(dl)                      (dense table)

Only c is recomputed (one einsum, for the clamp mask); the softmax is never
recomputed.  Attention dropout stays outside in XLA (nn/layers.py::
lean_dropout), exactly as in the XLA path.  The conditional-clamp predicate
(clip_val) is computed by the caller from the batch-GLOBAL max, matching the
reference (setrans.py:527-529) and this repo's unfused path.

Same custom_vjp structure as corr_vjp.fused_agg_corr_diff (the scores-only
correlation site), which set the pattern: Pallas forward, XLA backward.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probs_bwd_kernel(q_ref, kt_ref, p_ref, g_ref, scal_ref, dc_ref,
                      dlsum_ref, *, scale):
    """One (q-tile, bm) grid step of the probs backward.

    Computes, over a full-k-width stripe:
        row = sum_j(g * p)                      (softmax VJP row term, f32)
        dl  = p * (g - row)                     (d wrt post-bias logits)
        dc  = dl * 1[|q k^T * scale| < clip]    (conditional-clamp mask —
                                                 c is recomputed on the MXU,
                                                 never stored)
        dlsum[q-tile] += dl                     (sum over batch*modes, f32 —
                                                 feeds both the dense-table
                                                 and sliding-window bias grads)
    Grid is (q_tiles, BM) with BM innermost so the dlsum output stripe
    (indexed by q-tile only) is revisited consecutively and accumulates in
    VMEM.  All padding is zeros in p/g, which zeroes dl/dc/dlsum there.
    """
    bm = pl.program_id(1)

    @pl.when(bm == 0)
    def _():
        dlsum_ref[:] = jnp.zeros_like(dlsum_ref)

    clip_val = scal_ref[0]
    p32 = p_ref[0].astype(jnp.float32)
    g32 = g_ref[0].astype(jnp.float32)
    row = jnp.sum(g32 * p32, axis=1, keepdims=True)
    dl = p32 * (g32 - row)
    c = jax.lax.dot_general(
        q_ref[0].astype(jnp.float32), kt_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dc_ref[0] = jnp.where(jnp.abs(c) < clip_val, dl, 0.0).astype(dc_ref.dtype)
    dlsum_ref[:] += dl


def _pallas_probs_bwd(q, k, p, g, clip_val, io_dtype, interpret, tq=128):
    """dc [B, M, U1, U2] (io_dtype) + dlsum [U1, U2] (f32, summed over B*M)
    via _probs_bwd_kernel.  Replaces the XLA elementwise/reduce chain whose
    fused leading-dim reduce read the loop-transposed d_probs layout at
    ~1/20th of HBM bandwidth (round-4 trace: one 94 ms fusion per step)."""
    from craft_tpu.ops.pallas.mode_attention import _flatten_batch, _pad_to

    (qf, kf, pf, gf), bm = _flatten_batch(q, k, p, g)
    BM, U1, md = qf.shape
    U2 = kf.shape[1]
    scale = 1.0 / math.sqrt(md)
    U2p = ((U2 + 127) // 128) * 128
    # VMEM guard: the kernel holds ~5 f32 [tq, U2p] temporaries plus the f32
    # dlsum stripe and three io_dtype blocks; at things/sintel training
    # crops (U2p ~4480-4608) a tq=128 stripe approaches the 16 MB budget.
    # Shrink the q tile so the working set stays well under it (tq stays a
    # multiple of 32 for f32/bf16 sublane tiling).
    #
    # Why shrink tq instead of tiling the k axis: the softmax-VJP row term
    # needs the full row before dl, so a k-tiled kernel is two phases over
    # k per q tile and reads the [BM, U1, U2] probs/grads TWICE from HBM —
    # doubling the dominant traffic to save nothing (the elementwise work
    # is VPU/lane-bound, and a 64- or 32-row stripe keeps lanes full; only
    # the c-recompute matmul narrows, a minor term).  tq=64 covers the
    # things/sintel stages (U2p<=4608); tq=32 covers up to U2p~12k, beyond
    # any reference training crop.  Measured at the things config
    # (400x720, batch 3): 763.6 ms/step wall, no VMEM overflow
    # (BENCH_NOTES round 5).
    if tq * U2p > 128 * 3072:
        tq = max(32, (128 * 3072 // U2p) // 32 * 32)
    U1p = ((U1 + tq - 1) // tq) * tq

    qp = _pad_to(qf, U1p, 1).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(kf, U2p, 1).astype(io_dtype), 1, 2)
    pp = _pad_to(_pad_to(pf, U2p, 2), U1p, 1)
    gp = _pad_to(_pad_to(gf, U2p, 2), U1p, 1)

    grid = (U1p // tq, BM)
    dc, dlsum = pl.pallas_call(
        functools.partial(_probs_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, md), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md, U2p), lambda i, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, U2p), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, U2p), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, U2p), lambda i, b: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, U2p), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BM, U1p, U2p), io_dtype),
            jax.ShapeDtypeStruct((U1p, U2p), jnp.float32),
        ],
        interpret=interpret,
    )(qp, ktp, pp, gp, jnp.asarray([clip_val], jnp.float32))
    dc = dc[:, :U1, :U2]
    dlsum = dlsum[:U1, :U2]
    return (dc.reshape(bm + dc.shape[1:]) if bm else dc), dlsum


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def mode_softmax_probs_diff(q, k, bias_arg, clip_val, pos_w,
                            grid_hw: Tuple[int, int], structured: bool,
                            interpret: bool, io_dtype=jnp.bfloat16,
                            out_dtype=jnp.bfloat16):
    """Differentiable softmax probs.  q, k: [B, M, U, md] (or unbatched
    [M, U, md]); bias_arg: [2R+1, 2R+1] sliding window when structured, else
    a dense [U, U] table.  Returns probs [B, M, U, U] in out_dtype."""
    from craft_tpu.ops.pallas.mode_attention import (mode_softmax_probs,
                                                     mode_softmax_probs_mt)
    if structured:
        return mode_softmax_probs_mt(q, k, bias_arg, grid_hw, clip_val,
                                     pos_w, out_dtype=out_dtype,
                                     interpret=interpret, io_dtype=io_dtype)
    return mode_softmax_probs(q, k, bias_arg, clip_val, pos_w,
                              out_dtype=out_dtype, interpret=interpret,
                              io_dtype=io_dtype)


def _fwd(q, k, bias_arg, clip_val, pos_w, grid_hw, structured, interpret,
         io_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16):
    p = mode_softmax_probs_diff(q, k, bias_arg, clip_val, pos_w, grid_hw,
                                structured, interpret, io_dtype, out_dtype)
    return p, (q, k, bias_arg, clip_val, pos_w, p)


def _bwd(grid_hw, structured, interpret, io_dtype, out_dtype, res, g):
    q, k, bias_arg, clip_val, pos_w, p = res
    md = q.shape[-1]
    # Softmax VJP from the SAVED probs (bf16 under mixed precision — the
    # backward never recomputes exp/sum; under bf16 training the resulting
    # grad deviation is well below the bf16 noise floor, see
    # tests/test_probs_vjp.py tolerances).  One Pallas pass produces the
    # clamp-masked d_scores (dc, io_dtype — the einsum operand below) and
    # the batch*mode-summed d_logits (dlsum, f32 — both bias grads derive
    # from it), recomputing c tile-wise on the MXU.  The previous XLA chain
    # materialized f32 c and fused the leading-dim dbias reduce with the
    # elementwise dl into one fusion that read the scan loop's transposed
    # d_probs layout at ~1/20th of HBM bandwidth (94 ms/step at the chairs
    # config, round-4 trace).
    dc, dlsum = _pallas_probs_bwd(q, k, p, g, clip_val, io_dtype, interpret)

    dq = jnp.einsum("...mij,...mjd->...mid", dc, k.astype(io_dtype),
                    preferred_element_type=jnp.float32) / math.sqrt(md)
    dk = jnp.einsum("...mij,...mid->...mjd", dc, q.astype(io_dtype),
                    preferred_element_type=jnp.float32) / math.sqrt(md)

    if structured:
        from craft_tpu.nn.setrans import sliding_pos_biases
        from craft_tpu.ops.pallas.corr_vjp import _sliding_bias_grad
        H, W = grid_hw
        R = (bias_arg.shape[0] - 1) // 2
        dbias = _sliding_bias_grad(dlsum, H, W, R, pos_w)
        dposw = jnp.sum(dlsum * sliding_pos_biases(bias_arg, H, W))
    else:
        dbias = pos_w * dlsum
        dposw = jnp.sum(dlsum * bias_arg.astype(jnp.float32))
    dclip = jnp.zeros_like(clip_val)
    return (dq.astype(q.dtype), dk.astype(k.dtype),
            dbias.astype(bias_arg.dtype), dclip, dposw)


mode_softmax_probs_diff.defvjp(_fwd, _bwd)
