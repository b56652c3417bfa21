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
    p32 = p.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    # Softmax VJP from the SAVED probs (bf16 under mixed precision — the
    # backward never recomputes exp/sum; under bf16 training the resulting
    # grad deviation is well below the bf16 noise floor, see
    # tests/test_probs_vjp.py tolerances).  The row sum reduces in f32 (tiny
    # output); dl itself is emitted in io_dtype so the [B, M, U, U]-sized
    # elementwise fusions stay half-width — an f32 output here tripped
    # XLA's 16 MB scoped-VMEM fusion limit at the chairs train config.
    row = jnp.sum(g32 * p32, axis=-1, keepdims=True)
    dl = (p32 * (g32 - row)).astype(io_dtype)

    # Conditional-clamp mask needs the raw scores once (a single einsum —
    # the only recompute in this backward).
    c = jnp.einsum("...mid,...mjd->...mij", q.astype(io_dtype),
                   k.astype(io_dtype),
                   preferred_element_type=jnp.float32) / math.sqrt(md)
    dc = jnp.where(jnp.abs(c) < clip_val, dl, jnp.zeros((), io_dtype))

    dq = jnp.einsum("...mij,...mjd->...mid", dc, k.astype(io_dtype),
                    preferred_element_type=jnp.float32) / math.sqrt(md)
    dk = jnp.einsum("...mij,...mid->...mjd", dc, q.astype(io_dtype),
                    preferred_element_type=jnp.float32) / math.sqrt(md)

    if structured:
        from craft_tpu.nn.setrans import sliding_pos_biases
        from craft_tpu.ops.pallas.corr_vjp import _sliding_bias_grad
        H, W = grid_hw
        R = (bias_arg.shape[0] - 1) // 2
        dbias = _sliding_bias_grad(dl, H, W, R, pos_w)
        dposw = jnp.sum(dl.astype(jnp.float32)
                        * sliding_pos_biases(bias_arg, H, W))
    else:
        lead = tuple(range(dl.ndim - 2))
        dbias = pos_w * jnp.sum(dl, axis=lead, dtype=jnp.float32)
        dposw = jnp.sum(dl.astype(jnp.float32) * bias_arg.astype(jnp.float32))
    dclip = jnp.zeros_like(clip_val)
    return (dq.astype(q.dtype), dk.astype(k.dtype),
            dbias.astype(bias_arg.dtype), dclip, dposw)


mode_softmax_probs_diff.defvjp(_fwd, _bwd)
