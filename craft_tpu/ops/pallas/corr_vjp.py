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


def _modes_scores(q, k, bias_dense, clip_val, pos_w):
    """XLA recompute of clamped per-mode scores.  q, k: [..., M, U, md]."""
    md = q.shape[-1]
    c = jnp.einsum("...mid,...mjd->...mij", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(md)
    s = jnp.clip(c, -clip_val, clip_val)
    if bias_dense is not None:
        s = s + pos_w * bias_dense
    return c, s


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
    c, s = _modes_scores(q.astype(jnp.float32), k.astype(jnp.float32),
                         bias_dense, clip_val, pos_w)
    vol_m = jnp.expand_dims(vol, -3)  # broadcast over the mode axis
    g_m = jnp.expand_dims(g, -3)
    logits = agg_w * s
    p = jax.nn.softmax(logits, axis=-3)
    t = p * (1.0 + agg_w * (s - vol_m))
    dc = (g_m * t) * (jnp.abs(c) < clip_val)

    dq = jnp.einsum("...mij,...mjd->...mid", dc,
                    k.astype(jnp.float32)) / math.sqrt(md)
    dk = jnp.einsum("...mij,...mid->...mjd", dc,
                    q.astype(jnp.float32)) / math.sqrt(md)
    dbias = _sliding_bias_grad(g, H, W, R, pos_w)
    da = jnp.sum(g_m * p * s * (s - vol_m))
    db = jnp.zeros_like(da)
    dclip = jnp.zeros_like(clip_val)
    dposw = jnp.sum(g * bias_dense)  # s_m each contain w*B: sum_m t_m == 1
    return (dq.astype(q.dtype), dk.astype(k.dtype),
            dbias.astype(biases.dtype), dclip, dposw, da, db)


fused_agg_corr_diff.defvjp(_fwd, _bwd)
