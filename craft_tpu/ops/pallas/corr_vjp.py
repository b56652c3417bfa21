"""Differentiable fused attentional-correlation: Pallas forward + XLA backward.

The inter-frame correlation site (out_attn_scores_only) applies no dropout
(reference setrans.py:544-550), so its Pallas forward can be used in training
too — this module wraps `fused_agg_corr_mt` in a jax.custom_vjp whose backward
recomputes per-mode scores with plain XLA (the same work a remat'd XLA forward
would do in the backward pass, but the forward never materializes [M, U, U]).

Math (per batch element; s_m = clamp(c_m) + w*B, p = softmax_m(a*s_m + b),
vol = sum_m p_m s_m):
  dvol/ds_m       = p_m * (1 + a * (s_m - vol))          =: t_m
  dc_m            = g * t_m * 1[|c_m| < clip_val]
  dq_m, dk_m      = (dc_m @ k_m, dc_m^T @ q_m) / sqrt(md)
  dB              = w * g            (sum_m t_m == 1 identically)
  da              = sum g * sum_m p_m s_m (s_m - vol);   db = 0 (softmax shift)
The sliding-bias window gradient gathers dB's diagonals: for token offset
(dh, dw), bias[dh+R, dw+R] accumulates the k = dh*W + dw diagonal of g.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _agg_corr_bwd_kernel(q_ref, kt_ref, g_ref, vol_ref, bias_ref, scal_ref,
                         dc_ref, da_ref, *, scale):
    """One (q-tile, k-tile, batch) grid step of the fused-correlation
    backward.  The learned mode aggregation couples only the mode axis (no
    row reductions), so each tile is independent:

        c_m  = q_m k_m^T * scale          (recomputed on the MXU, per mode)
        s_m  = clamp(c_m) + w * Bias
        p    = softmax_m(a * s_m)
        t_m  = p_m * (1 + a * (s_m - vol))
        dc_m = g * t_m * 1[|c_m| < clip]  -> the dq/dk einsum operand
        da  += sum(g * p_m s_m (s_m - vol))

    dB = w*g and dposw = sum(g*Bias) need no kernel (sum_m t_m == 1).
    Zero-padding in g zeroes dc/da contributions there.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when((i == 0) & (j == 0) & (b == 0))
    def _():
        da_ref[:, :] = jnp.zeros_like(da_ref)

    clip_val = scal_ref[0]
    pos_w = scal_ref[1]
    agg_w = scal_ref[2]
    c = jax.lax.dot_general(
        q_ref[0].astype(jnp.float32), kt_ref[0].astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [M, tq, tk]
    s = jnp.clip(c, -clip_val, clip_val) + pos_w * bias_ref[:][None]
    ls = agg_w * s
    p = jnp.exp(ls - jnp.max(ls, axis=0, keepdims=True))
    p = p / jnp.sum(p, axis=0, keepdims=True)
    g32 = g_ref[0].astype(jnp.float32)[None]
    sv = s - vol_ref[0].astype(jnp.float32)[None]
    t = p * (1.0 + agg_w * sv)
    dc_ref[0] = jnp.where(jnp.abs(c) < clip_val, g32 * t, 0.0).astype(
        dc_ref.dtype)
    da_ref[:, :] += jnp.sum(g32 * p * s * sv).reshape(1, 1)


def _pallas_agg_corr_bwd(q, k, g, vol, bias_dense, clip_val, pos_w, agg_w,
                         interpret, io_dtype, tq=128, tk=512):
    """dc [B, M, U, U] (io_dtype) + da scalar via _agg_corr_bwd_kernel.
    Replaces the XLA recompute that materialized c, s, p, t as full f32
    [B, M, U, U] tensors (4 x 520 MB at the chairs train config, chunked by
    XLA through 'wide' while loops)."""
    from craft_tpu.ops.pallas.mode_attention import _pad_to

    unbatched = q.ndim == 3
    if unbatched:
        q, k, g, vol = q[None], k[None], g[None], vol[None]
    B, M, U1, md = q.shape
    U2 = k.shape[2]
    scale = 1.0 / math.sqrt(md)
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk

    qp = _pad_to(q, U1p, 2)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 2), 2, 3)
    gp = _pad_to(_pad_to(g, U2p, 2), U1p, 1)
    volp = _pad_to(_pad_to(vol, U2p, 2), U1p, 1)
    biasp = _pad_to(_pad_to(bias_dense.astype(jnp.float32), U2p, 1), U1p, 0)

    # Grid order (i, j, b): the bias tile (i, j) stays resident across the
    # batch; the da scalar block is revisited by every step (accumulates).
    grid = (U1p // tq, U2p // tk, B)
    dc, da = pl.pallas_call(
        functools.partial(_agg_corr_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda i, j, b: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda i, j, b: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, tk), lambda i, j, b: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, tk), lambda i, j, b: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, tk), lambda i, j, b: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M, tq, tk), lambda i, j, b: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, U1p, U2p), io_dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, ktp, gp, volp, biasp,
      jnp.asarray([clip_val, pos_w, agg_w], jnp.float32))
    dc = dc[:, :, :U1, :U2]
    if unbatched:
        dc = dc[0]
    return dc, da[0, 0]


def _sliding_bias_grad(g: jnp.ndarray, H: int, W: int, R: int,
                       pos_w: float) -> jnp.ndarray:
    """d(biases[dh+R, dw+R]) = pos_w * masked diagonal sums of g [..., U, U]
    (summed over any leading batch dims)."""
    U = H * W
    j_idx = jnp.arange(U) % W
    i_idx = jnp.arange(U) // W
    rows = []
    for dh in range(-R, R + 1):
        cols = []
        for dw in range(-R, R + 1):
            off = dh * W + dw
            diag = jnp.diagonal(g, offset=off, axis1=-2, axis2=-1)
            ncut = U - abs(off)
            u1 = jnp.arange(ncut) + max(0, -off)
            valid = ((j_idx[u1] + dw >= 0) & (j_idx[u1] + dw < W)
                     & (i_idx[u1] + dh >= 0) & (i_idx[u1] + dh < H))
            # f32 accumulation even for bf16 cotangents (probs_vjp passes
            # dl in the kernel io dtype).
            cols.append(jnp.sum((diag * valid).astype(jnp.float32)))
        rows.append(jnp.stack(cols))
    return pos_w * jnp.stack(rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_agg_corr_diff(q, k, biases, clip_val, pos_w, agg_w, agg_b,
                        grid_hw: Tuple[int, int], interpret: bool,
                        io_dtype=jnp.float32):
    """Differentiable fused correlation volume.  q, k: [M, U, md] or
    [B, M, U, md] (batch = leading Pallas grid axis, no per-sample vmap);
    biases: [2R+1, 2R+1] sliding window.  Returns [U, U] / [B, U, U] fp32.

    Forward kernel selection: block-Toeplitz bias assembly when the W8 tile
    aligns to Mosaic's (8, 128) constraint, otherwise the dense-bias kernel
    (the dense table is small at training crop sizes)."""
    from craft_tpu.ops.pallas.mode_attention import (fused_agg_corr,
                                                     fused_agg_corr_mt,
                                                     mt_alignment_ok)

    H, W = grid_hw
    if mt_alignment_ok(W):
        return fused_agg_corr_mt(q, k, biases, grid_hw, clip_val, pos_w,
                                 agg_w, agg_b, interpret=interpret,
                                 io_dtype=io_dtype)
    from craft_tpu.nn.setrans import sliding_pos_biases

    dense = sliding_pos_biases(biases, H, W)
    return fused_agg_corr(q, k, dense, clip_val, pos_w, agg_w, agg_b,
                          interpret=interpret, io_dtype=io_dtype)


def _fwd(q, k, biases, clip_val, pos_w, agg_w, agg_b, grid_hw, interpret,
         io_dtype=jnp.float32):
    vol = fused_agg_corr_diff(q, k, biases, clip_val, pos_w, agg_w, agg_b,
                              grid_hw, interpret, io_dtype)
    return vol, (q, k, biases, clip_val, pos_w, agg_w, vol)


def _bwd(grid_hw, interpret, io_dtype, res, g):
    from craft_tpu.nn.setrans import sliding_pos_biases

    q, k, biases, clip_val, pos_w, agg_w, vol = res
    H, W = grid_hw
    R = (biases.shape[0] - 1) // 2
    md = q.shape[-1]
    g = g.astype(jnp.float32)

    bias_dense = sliding_pos_biases(biases, H, W)
    # One Pallas pass recomputes the per-mode scores tile-wise on the MXU and
    # emits the clamp-masked dc plus the agg_w cotangent — the XLA recompute
    # it replaces materialized c/s/p/t as full f32 [B, M, U, U] tensors.
    dc, da = _pallas_agg_corr_bwd(q, k, g, vol, bias_dense, clip_val, pos_w,
                                  agg_w, interpret, jnp.float32)

    dq = jnp.einsum("...mij,...mjd->...mid", dc,
                    k.astype(jnp.float32)) / math.sqrt(md)
    dk = jnp.einsum("...mij,...mid->...mjd", dc,
                    q.astype(jnp.float32)) / math.sqrt(md)
    dbias = _sliding_bias_grad(g, H, W, R, pos_w)
    db = jnp.zeros_like(da)
    dclip = jnp.zeros_like(clip_val)
    dposw = jnp.sum(g * bias_dense)  # s_m each contain w*B: sum_m t_m == 1
    return (dq.astype(q.dtype), dk.astype(k.dtype),
            dbias.astype(biases.dtype), dclip, dposw, da, db)


fused_agg_corr_diff.defvjp(_fwd, _bwd)
