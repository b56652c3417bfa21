"""Pallas TPU kernels for the SETrans multi-mode attention stack.

Three kernels replace the XLA paths that materialize [M, U, U] score tensors
(~793 MB fp32 at Sintel size; SURVEY.md §2.3, §5.7):

  * scores_global_max:  global max of QK^T/sqrt(md) over all modes — the
    predicate for the reference's *conditional* attention clamp
    (setrans.py:520-529) without materializing scores.
  * flash_mode_attention:  blockwise softmax(clamp(scores) + w*bias) @ V per
    mode — the f2-transformer core; only [M, U, F] leaves the kernel.
  * fused_agg_corr:  clamp + bias + learned softmax mode-aggregation producing
    the [U, U] correlation volume directly (TransCorrBlock's CrossAttFeatTrans
    with out_attn_scores_only, corr.py:191-207 + setrans.py:545-550).

All kernels tile the U axes in (TQ, TK) blocks, run matmuls on the MXU in
fp32, and read the dense positional-bias table tile-by-tile from HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flatten_batch(*arrays):
    """[B, M, U, d] -> [B*M, U, d] (batch folded into the mode grid axis —
    all modes are independent in the per-mode kernels, so a batch is just
    more modes).  3D inputs pass through unchanged."""
    if arrays[0].ndim == 3:
        return arrays, None
    B, M = arrays[0].shape[:2]
    return tuple(a.reshape((B * M,) + a.shape[2:]) for a in arrays), (B, M)


# ---------------------------------------------------------------------------
# Kernel 1: global max of mode attention scores (no materialization)
# ---------------------------------------------------------------------------

def _max_kernel(q_ref, kt_ref, out_ref, *, scale):
    # q_ref: [M, TQ, md]; kt_ref: [M, md, TK] (k pre-transposed so the MXU
    # contraction is lanes(q) x sublanes(kt) — no per-step relayout);
    # out_ref: [1, 1]
    M = q_ref.shape[0]
    m = NEG_INF
    for mode in range(M):
        s = jax.lax.dot_general(
            q_ref[mode], kt_ref[mode],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.maximum(m, jnp.max(s))
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = NEG_INF

    out_ref[0, 0] = jnp.maximum(out_ref[0, 0], m)


def scores_global_max(q, k, scale, tq=512, tk=512, interpret=False,
                      io_dtype=jnp.float32):
    """q, k: [M, U, md] (or [B, M, U, md]) -> scalar max of scale * q @ k^T
    over everything (the reference clamp predicate is a max over the whole
    batched score tensor, setrans.py:520-529).

    Padded keys/queries are zero vectors -> score 0; since real volumes always
    contain values >= 0 somewhere this does not disturb the clamp predicate
    in practice, and the clamp itself is exact (applied to real tiles only).
    """
    (q, k), _ = _flatten_batch(q, k)
    M, U1, md = q.shape
    U2 = k.shape[1]
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk
    qp = _pad_to(q, U1p, 1).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 1).astype(io_dtype), 1, 2)
    grid = (U1p // tq, U2p // tk)
    out = pl.pallas_call(
        functools.partial(_max_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tq, md), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, md, tk), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(qp, ktp)
    return out[0, 0]


# ---------------------------------------------------------------------------
# Sliding-pos-bias as a block-Toeplitz assembly (no dense [U, U] table)
# ---------------------------------------------------------------------------
#
# bias[(qi, qj), (kh, kw)] = B[kh-qi+R, kw-qj+R] (zero outside the window;
# reference SlidingPosBiases2D, setrans.py:644-708).  For row-major tokens the
# [U, U] table consists of [W8, W8] sub-blocks that depend only on the row
# offset d = kh - qi, so a [2R+1, W8, W8] table M[d+R] suffices: each (TQ, TK)
# tile is assembled from rq x rk sub-blocks selected by d.  This removes the
# ~200 MB dense-bias build + reads at Sintel size.

def mt_tiles(w8: int):
    rq = max(1, 256 // w8)
    rk = max(1, 512 // w8)
    return rq, rk


def mt_alignment_ok(w8: int) -> bool:
    """Mosaic requires block shapes divisible by (8, 128) in the last two
    dims; the mtable kernels tile in multiples of W8.  Returns False when the
    caller must fall back to the dense-bias kernels (which pad internally)."""
    rq, rk = mt_tiles(w8)
    return (rq * w8) % 8 == 0 and (rk * w8) % 128 == 0


def make_rowbias_table(biases: jnp.ndarray, w8: int) -> jnp.ndarray:
    """[2R+1, 2R+1] window -> M [2R+1, W8, W8] with
    M[a, qj, kw] = biases[a, kw-qj+R] (0 outside)."""
    R = (biases.shape[0] - 1) // 2
    dw = jnp.arange(w8)[None, :] - jnp.arange(w8)[:, None]  # [qj, kw]
    mask = jnp.abs(dw) <= R
    idx = jnp.clip(dw + R, 0, 2 * R)
    table = biases[:, idx]  # [2R+1, W8, W8]
    return table * mask[None]


def _bias_tile_from_mtable(m_ref, qi0, kh0, rq, rk, w8, R):
    """Assemble a [rq*W8, rk*W8] bias tile from the row-offset table."""
    rows = []
    for a in range(rq):
        cols = []
        for b in range(rk):
            d = (kh0 + b) - (qi0 + a)
            valid = jnp.abs(d) <= R
            idx = jnp.clip(d + R, 0, 2 * R)
            blk = m_ref[pl.ds(idx, 1)][0]  # [W8, W8]
            blk = jnp.where(valid, blk, 0.0)
            cols.append(blk)
        rows.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# Kernel 2: flash multi-mode attention (f2 transformer core)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, kt_ref, v_ref, bias_ref, clip_ref, out_ref,
                  acc_ref, m_ref, l_ref, *, scale, pos_w, nkv):
    # Grid: (modes, q_tiles, k_tiles) with k innermost.
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    clip_val = clip_ref[0]
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.clip(s, -clip_val, clip_val)
    s = s + pos_w * bias_ref[:]  # bias carries -inf on padded keys

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [TQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [TQ, TK]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kt == nkv - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def flash_mode_attention(q, k, v, bias, clip_val, pos_w,
                         tq=256, tk=512, out_dtype=jnp.float32,
                         interpret=False, io_dtype=jnp.float32):
    """out[m] = softmax(clamp(scale * q_m k_m^T) + pos_w * bias) @ v_m.

    q, k: [M, U, md]; v: [M, U2, F]; bias: [U, U2] (or None);
    clip_val: scalar (pass +inf to disable clamping).
    Returns [M, U, F].  Batched [B, M, ...] inputs fold B into the mode grid
    axis (one kernel launch, no per-sample vmap dispatch).
    """
    (q, k, v), bm = _flatten_batch(q, k, v)
    M, U1, md = q.shape
    U2, F = v.shape[1], v.shape[2]
    scale = 1.0 / (md ** 0.5)
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk

    qp = _pad_to(q, U1p, 1).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 1).astype(io_dtype), 1, 2)
    vp = _pad_to(v, U2p, 1).astype(io_dtype)
    if bias is None:
        bias = jnp.zeros((U1, U2), jnp.float32)
    biasp = _pad_to(_pad_to(bias.astype(jnp.float32), U2p, 1,
                            value=NEG_INF), U1p, 0)

    nkv = U2p // tk
    grid = (M, U1p // tq, nkv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, pos_w=pos_w, nkv=nkv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, md), lambda m, i, j: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md, tk), lambda m, i, j: (m, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, F), lambda m, i, j: (m, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, tk), lambda m, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, F), lambda m, i, j: (m, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, U1p, F), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, F), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, ktp, vp, biasp, jnp.asarray([clip_val], jnp.float32))
    out = out[:, :U1]
    return out.reshape(bm + out.shape[1:]) if bm else out


def _flash_kernel_mt(q_ref, kt_ref, v_ref, m_ref, clip_ref, row0_ref,
                     out_ref, acc_ref, mx_ref, l_ref, *, scale, pos_w, nkv,
                     rq, rk, w8, R, u2_valid):
    it = pl.program_id(1)
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        mx_ref[:] = jnp.full_like(mx_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    clip_val = clip_ref[0]
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.clip(s, -clip_val, clip_val)
    # row0_ref: global W8-row offset of this shard's first query row —
    # nonzero under sequence parallelism, where q holds a row slice of the
    # full token axis (parallel/sequence_parallel.py).
    s = s + pos_w * _bias_tile_from_mtable(m_ref, row0_ref[0] + it * rq,
                                           kt * rk, rq, rk, w8, R)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kt * (rk * w8)
    s = jnp.where(col < u2_valid, s, NEG_INF)

    m_prev = mx_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    mx_ref[:] = m_new

    @pl.when(kt == nkv - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def flash_mode_attention_mt(q, k, v, biases, grid_hw, clip_val, pos_w,
                            out_dtype=jnp.float32, interpret=False,
                            io_dtype=jnp.float32, q_row0=None):
    """flash_mode_attention with the sliding bias assembled in-kernel from
    the [2R+1, W8, W8] block-Toeplitz table (self-attention: U2 == H8*W8
    given by grid_hw).  Batched [B, M, ...] inputs fold B into the mode grid
    axis.

    q_row0: global W8-row offset of q's first row (traced int scalar) —
    for sequence-parallel shards where q is a row slice (U1 = U2 / n_shards,
    shard-aligned to whole W8 rows); None/0 for the full self-attention."""
    (q, k, v), bm = _flatten_batch(q, k, v)
    M, U1, md = q.shape
    H8, W8 = grid_hw
    U2, F = v.shape[1], v.shape[2]
    assert U2 == H8 * W8 and U1 <= U2 and U1 % W8 == 0
    R = (biases.shape[0] - 1) // 2
    scale = 1.0 / (md ** 0.5)
    rq = max(1, 256 // W8)
    rk = max(1, 512 // W8)
    tq, tk = rq * W8, rk * W8
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk

    qp = _pad_to(q, U1p, 1).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 1).astype(io_dtype), 1, 2)
    vp = _pad_to(v, U2p, 1).astype(io_dtype)
    mtable = make_rowbias_table(biases, W8)

    nkv = U2p // tk
    grid = (M, U1p // tq, nkv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_mt, scale=scale, pos_w=pos_w,
                          nkv=nkv, rq=rq, rk=rk, w8=W8, R=R, u2_valid=U2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, md), lambda m, i, j: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md, tk), lambda m, i, j: (m, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, F), lambda m, i, j: (m, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R + 1, W8, W8), lambda m, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, F), lambda m, i, j: (m, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, U1p, F), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, F), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, ktp, vp, mtable, jnp.asarray([clip_val], jnp.float32),
      jnp.asarray([0 if q_row0 is None else q_row0], jnp.int32))
    out = out[:, :U1]
    return out.reshape(bm + out.shape[1:]) if bm else out


def _agg_corr_kernel_mt(q_ref, kt_ref, m_ref, scal_ref, row0_ref, out_ref,
                        *, scale, num_modes, rq, rk, w8, R):
    # Grid: (batch, q_tiles, k_tiles); q_ref [1, M, TQ, md],
    # kt_ref [1, M, md, TK] (pre-transposed, MXU-natural contraction).
    it = pl.program_id(1)
    kt = pl.program_id(2)
    clip_val = scal_ref[0]
    pos_w = scal_ref[1]
    agg_w = scal_ref[2]
    agg_b = scal_ref[3]

    # row0_ref: global W8-row offset of this shard's first query row
    # (sequence parallelism); 0 for the full volume.
    bias = pos_w * _bias_tile_from_mtable(m_ref, row0_ref[0] + it * rq,
                                          kt * rk, rq, rk, w8, R)
    ss = []
    for mode in range(num_modes):
        s = jax.lax.dot_general(
            q_ref[0, mode], kt_ref[0, mode],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.clip(s, -clip_val, clip_val) + bias
        ss.append(s)
    logits = [agg_w * s + agg_b for s in ss]
    mmax = logits[0]
    for lg in logits[1:]:
        mmax = jnp.maximum(mmax, lg)
    exps = [jnp.exp(lg - mmax) for lg in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    acc = exps[0] * ss[0]
    for e, s in zip(exps[1:], ss[1:]):
        acc = acc + e * s
    out_ref[0] = acc / denom


def fused_agg_corr_mt(q, k, biases, grid_hw, clip_val, pos_w, agg_w, agg_b,
                      interpret=False, io_dtype=jnp.float32, q_row0=None):
    """fused_agg_corr with in-kernel sliding-bias assembly (U2 == H8*W8).
    q, k: [M, U, md] or [B, M, U, md] (batch = leading grid axis);
    returns [U1, U2] / [B, U1, U2].

    q_row0: global W8-row offset of q's first row (traced int scalar) for
    sequence-parallel row shards (U1 = U2 / n_shards); None/0 otherwise."""
    batched = q.ndim == 4
    if not batched:
        q, k = q[None], k[None]
    B, M, U1, md = q.shape
    H8, W8 = grid_hw
    U2 = k.shape[2]
    assert U2 == H8 * W8 and U1 <= U2 and U1 % W8 == 0
    R = (biases.shape[0] - 1) // 2
    scale = 1.0 / (md ** 0.5)
    rq = max(1, 256 // W8)
    rk = max(1, 512 // W8)
    tq, tk = rq * W8, rk * W8
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk
    qp = _pad_to(q, U1p, 2).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 2).astype(io_dtype), 2, 3)
    mtable = make_rowbias_table(biases, W8)
    scal = jnp.asarray([clip_val, pos_w, agg_w, agg_b], jnp.float32)

    grid = (B, U1p // tq, U2p // tk)
    out = pl.pallas_call(
        functools.partial(_agg_corr_kernel_mt, scale=scale, num_modes=M,
                          rq=rq, rk=rk, w8=W8, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R + 1, W8, W8), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, tk), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, U1p, U2p), jnp.float32),
        interpret=interpret,
    )(qp, ktp, mtable, scal,
      jnp.asarray([0 if q_row0 is None else q_row0], jnp.int32))
    out = out[:, :U1, :U2]
    return out if batched else out[0]


# ---------------------------------------------------------------------------
# Kernel 2a': fused correlation + conditional clamp + global layer-norm
# ---------------------------------------------------------------------------
#
# The inference inter-frame path previously cost four full passes over the
# ~800 MB/sample volume: kernel write (fp32), norm-stats read, normalize
# read+write, bf16 cast for the pyramid — plus a separate gmax kernel for the
# conditional-clamp predicate.  Here two sweeps over tiles recompute the
# cheap QK^T scores (25 GFLOP/sample vs GBs of HBM) and the only volume-sized
# traffic left is ONE bf16 write of the normalized pyramid base:
#   kernel 1 (stats):  ph0 accumulates the raw-score global max (the clamp
#     predicate, reference setrans.py:527-529), ph1 re-computes the clamped
#     aggregated volume and accumulates sum / sum-of-squares
#     (reference corr.py:27-30, 200-204 global layer-norm).
#   kernel 2 (write):  normalizes each tile with the [B, 4] stats and writes
#     the pyramid level-0 directly in the lookup layout/dtype.
# Requires tile sizes that divide (U1, U2) exactly (no padded slice copy):
# satisfied when W8 % 128 == 0 — Sintel/video widths; other shapes fall back
# to the unfused path.

def _corr_stats_kernel(q_ref, kt_ref, m_ref, scal_ref, out_ref, acc_ref, *,
                       scale, num_modes, rq, rk, w8, R, n_elems):
    # Grid is (phase, B, ni, nj): ALL samples' raw-max pass (ph 0) completes
    # before any normalize pass (ph 1), so the clamp predicate is the
    # batch-GLOBAL max — matching the reference (setrans.py:521-529) and
    # this repo's unfused path (scores_global_max over the whole batch).
    ph = pl.program_id(0)
    b = pl.program_id(1)
    it = pl.program_id(2)
    kt = pl.program_id(3)
    ni = pl.num_programs(2)
    nj = pl.num_programs(3)

    @pl.when((ph == 0) & (b == 0) & (it == 0) & (kt == 0))
    def _():
        acc_ref[0, 0] = NEG_INF  # raw-score max (shared across the batch)

    @pl.when((ph == 1) & (it == 0) & (kt == 0))
    def _():
        acc_ref[0, 1] = 0.0      # per-sample sum
        acc_ref[0, 2] = 0.0      # per-sample sum of squares

    cs = []
    for mode in range(num_modes):
        c = jax.lax.dot_general(
            q_ref[0, mode], kt_ref[0, mode],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        cs.append(c)

    @pl.when(ph == 0)
    def _():
        m = cs[0]
        for c in cs[1:]:
            m = jnp.maximum(m, c)
        acc_ref[0, 0] = jnp.maximum(acc_ref[0, 0], jnp.max(m))

    @pl.when(ph == 1)
    def _():
        attn_clip = scal_ref[0]
        pos_w = scal_ref[1]
        agg_w = scal_ref[2]
        agg_b = scal_ref[3]
        gmax = acc_ref[0, 0]
        clip_val = jnp.where(gmax > attn_clip, attn_clip, 1e30)
        bias = pos_w * _bias_tile_from_mtable(m_ref, it * rq, kt * rk, rq,
                                              rk, w8, R)
        vol = _agg_modes(cs, clip_val, bias, agg_w, agg_b)
        acc_ref[0, 1] += jnp.sum(vol)
        acc_ref[0, 2] += jnp.sum(vol * vol)

        @pl.when((it == ni - 1) & (kt == nj - 1))
        def _():
            out_ref[0, 0, 0] = acc_ref[0, 0]
            out_ref[0, 0, 1] = acc_ref[0, 1] / n_elems       # mean
            out_ref[0, 0, 2] = acc_ref[0, 2] / n_elems       # E[x^2]
            out_ref[0, 0, 3] = 0.0


def _agg_modes(cs, clip_val, bias, agg_w, agg_b):
    """LearnedSoftAggregate over clamped+biased per-mode scores (same math
    as _agg_corr_kernel)."""
    ss = [jnp.clip(c, -clip_val, clip_val) + bias for c in cs]
    logits = [agg_w * s + agg_b for s in ss]
    mmax = logits[0]
    for lg in logits[1:]:
        mmax = jnp.maximum(mmax, lg)
    exps = [jnp.exp(lg - mmax) for lg in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    acc = exps[0] * ss[0]
    for e, s in zip(exps[1:], ss[1:]):
        acc = acc + e * s
    return acc / denom


def _corr_norm_write_kernel(q_ref, kt_ref, m_ref, scal_ref, stats_ref,
                            row0_ref, out_ref, *, scale, num_modes, rq, rk,
                            w8, R, eps):
    it = pl.program_id(1)
    kt = pl.program_id(2)
    attn_clip = scal_ref[0]
    pos_w = scal_ref[1]
    agg_w = scal_ref[2]
    agg_b = scal_ref[3]
    gmax = stats_ref[0, 0, 0]
    mean = stats_ref[0, 0, 1]
    var = jnp.maximum(stats_ref[0, 0, 2] - mean * mean, 0.0)
    clip_val = jnp.where(gmax > attn_clip, attn_clip, 1e30)

    cs = []
    for mode in range(num_modes):
        c = jax.lax.dot_general(
            q_ref[0, mode], kt_ref[0, mode],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        cs.append(c)
    # row0_ref: global W8-row offset of this shard's first query row
    # (sequence parallelism); 0 for the full volume.
    bias = pos_w * _bias_tile_from_mtable(m_ref, row0_ref[0] + it * rq,
                                          kt * rk, rq, rk, w8, R)
    vol = _agg_modes(cs, clip_val, bias, agg_w, agg_b)
    out_ref[0] = ((vol - mean) * jax.lax.rsqrt(var + eps)).astype(
        out_ref.dtype)


def _corr_sums_kernel(q_ref, kt_ref, m_ref, scal_ref, gmax_ref, row0_ref,
                      out_ref, acc_ref, *, scale, num_modes, rq, rk, w8, R,
                      n_elems):
    # Sequence-parallel stats half: the clamp predicate (GLOBAL gmax, from a
    # pmax across shards) arrives as an input instead of a phase-0 sweep;
    # per-sample sum / sum-of-squares accumulate over this shard's rows only
    # and are divided by the GLOBAL element count so a psum over shards
    # yields the exact mean / E[x^2] of the full volume.
    it = pl.program_id(1)
    kt = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)

    @pl.when((it == 0) & (kt == 0))
    def _():
        acc_ref[0, 0] = 0.0      # per-sample local sum
        acc_ref[0, 1] = 0.0      # per-sample local sum of squares

    attn_clip = scal_ref[0]
    pos_w = scal_ref[1]
    agg_w = scal_ref[2]
    agg_b = scal_ref[3]
    gmax = gmax_ref[0]
    clip_val = jnp.where(gmax > attn_clip, attn_clip, 1e30)

    cs = []
    for mode in range(num_modes):
        c = jax.lax.dot_general(
            q_ref[0, mode], kt_ref[0, mode],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        cs.append(c)
    bias = pos_w * _bias_tile_from_mtable(m_ref, row0_ref[0] + it * rq,
                                          kt * rk, rq, rk, w8, R)
    vol = _agg_modes(cs, clip_val, bias, agg_w, agg_b)
    acc_ref[0, 0] += jnp.sum(vol)
    acc_ref[0, 1] += jnp.sum(vol * vol)

    @pl.when((it == ni - 1) & (kt == nj - 1))
    def _():
        out_ref[0, 0, 0] = gmax
        out_ref[0, 0, 1] = acc_ref[0, 0] / n_elems
        out_ref[0, 0, 2] = acc_ref[0, 1] / n_elems
        out_ref[0, 0, 3] = 0.0


def _fused_norm_tiles(H8: int, W8: int, h8_q=None):
    """Largest (rq, rk) divisor pair with Mosaic (8, 128) alignment and a
    VMEM budget of ~12 live f32 tile buffers (the _agg_modes chain); None
    when no exact tiling exists (caller falls back to the unfused path).

    rk tiles the key axis (U2 = H8*W8 rows); rq tiles the query axis, whose
    row count is h8_q (a sequence-parallel shard's local rows) or H8.
    rk candidates are tried in descending order so a too-greedy tk never
    forecloses a feasible rq (e.g. W8=256: rk=3 leaves no rq, rk=2 does)."""
    if W8 % 128 != 0:
        return None
    h8_q = H8 if h8_q is None else h8_q
    kdivs = [d for d in range(1, H8 + 1) if H8 % d == 0]
    qdivs = [d for d in range(1, h8_q + 1) if h8_q % d == 0]
    # Wide-k split (tq=128, tk=640 at Sintel) measured ~15% faster than the
    # rq-major split, matching the probs-kernel tuning.
    for rk in sorted((d for d in kdivs
                      if d * W8 <= 768 and (d * W8) % 128 == 0),
                     reverse=True):
        tq_cap = min(256, 175_000 // (rk * W8))
        rq = max((d for d in qdivs
                  if d * W8 <= tq_cap and (d * W8) % 8 == 0), default=None)
        if rq is not None:
            return rq, rk
    return None


def fused_agg_corr_norm_mt(q, k, biases, grid_hw, attn_clip, pos_w, agg_w,
                           agg_b, out_dtype=jnp.bfloat16, eps: float = 1e-12,
                           interpret=False, io_dtype=jnp.float32):
    """Inter-frame correlation volume, conditionally clamped and globally
    layer-normed, in two QK^T sweeps and one bf16 volume write.

    q, k: [B, M, U, md]; returns (vol_norm [B, U1, U2] out_dtype,
    stats [B, 1, 4] fp32 (gmax, mean, E[x^2], 0)).  Caller must ensure
    _fused_norm_tiles(grid_hw) is not None."""
    assert q.ndim == 4
    B, M, U1, md = q.shape
    H8, W8 = grid_hw
    U2 = k.shape[2]
    assert U1 == H8 * W8 and U2 == U1
    R = (biases.shape[0] - 1) // 2
    scale = 1.0 / (md ** 0.5)
    rq, rk = _fused_norm_tiles(H8, W8)
    tq, tk = rq * W8, rk * W8
    ni, nj = U1 // tq, U2 // tk

    qp = q.astype(io_dtype)
    ktp = jnp.swapaxes(k.astype(io_dtype), 2, 3)
    mtable = make_rowbias_table(biases, W8)
    scal = jnp.asarray([attn_clip, pos_w, agg_w, agg_b], jnp.float32)

    stats = pl.pallas_call(
        functools.partial(_corr_stats_kernel, scale=scale, num_modes=M,
                          rq=rq, rk=rk, w8=W8, R=R,
                          n_elems=float(U1) * float(U2)),
        grid=(2, B, ni, nj),
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda p, b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda p, b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R + 1, W8, W8), lambda p, b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4), lambda p, b, i, j: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 4), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 4), jnp.float32)],
        interpret=interpret,
    )(qp, ktp, mtable, scal)

    vol = pl.pallas_call(
        functools.partial(_corr_norm_write_kernel, scale=scale, num_modes=M,
                          rq=rq, rk=rk, w8=W8, R=R, eps=eps),
        grid=(B, ni, nj),
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R + 1, W8, W8), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, tk), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, U1, U2), out_dtype),
        interpret=interpret,
    )(qp, ktp, mtable, scal, stats, jnp.zeros((1,), jnp.int32))
    return vol, stats


def _fused_norm_sharded_prep(q, k, biases, grid_hw, io_dtype):
    """Shared prep for the sequence-parallel fused-norm halves: q holds this
    shard's rows only (U1 = h8_q * W8 <= U2 = H8 * W8)."""
    assert q.ndim == 4
    B, M, U1, md = q.shape
    H8, W8 = grid_hw
    U2 = k.shape[2]
    assert U2 == H8 * W8 and U1 <= U2 and U1 % W8 == 0
    rq, rk = _fused_norm_tiles(H8, W8, h8_q=U1 // W8)
    tq, tk = rq * W8, rk * W8
    qp = q.astype(io_dtype)
    ktp = jnp.swapaxes(k.astype(io_dtype), 2, 3)
    mtable = make_rowbias_table(biases, W8)
    R = (biases.shape[0] - 1) // 2
    return (B, M, U1, U2, md, W8, R, rq, rk, tq, tk, qp, ktp, mtable)


def corr_norm_sums_mt(q, k, biases, grid_hw, gmax, attn_clip, pos_w, agg_w,
                      agg_b, q_row0=None, interpret=False,
                      io_dtype=jnp.float32):
    """Stats half of fused_agg_corr_norm_mt for a sequence-parallel row
    shard: q [B, M, U1_local, md] (whole W8 rows starting at global W8-row
    q_row0), k [B, M, U2, md] replicated, gmax the GLOBAL raw-score max
    (pmax of each shard's exact-tiled local max).  Returns [B, 1, 4] fp32
    (gmax, local_sum/N, local_sumsq/N, 0) with N the GLOBAL element count —
    psum slots 1-2 across shards for the exact mean / E[x^2]."""
    (B, M, U1, U2, md, W8, R, rq, rk, tq, tk, qp, ktp,
     mtable) = _fused_norm_sharded_prep(q, k, biases, grid_hw, io_dtype)
    scale = 1.0 / (md ** 0.5)
    scal = jnp.asarray([attn_clip, pos_w, agg_w, agg_b], jnp.float32)
    row0 = jnp.asarray([0 if q_row0 is None else q_row0], jnp.int32)
    gmax_arr = jnp.reshape(gmax, (1,)).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_corr_sums_kernel, scale=scale, num_modes=M,
                          rq=rq, rk=rk, w8=W8, R=R,
                          n_elems=float(U2) * float(U2)),
        grid=(B, U1 // tq, U2 // tk),
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R + 1, W8, W8), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 4), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.float32)],
        interpret=interpret,
    )(qp, ktp, mtable, scal, gmax_arr, row0)


def corr_norm_write_mt(q, k, biases, grid_hw, stats, attn_clip, pos_w,
                       agg_w, agg_b, q_row0=None, out_dtype=jnp.bfloat16,
                       eps: float = 1e-12, interpret=False,
                       io_dtype=jnp.float32):
    """Write half of fused_agg_corr_norm_mt for a sequence-parallel row
    shard: normalizes this shard's rows of the clamped aggregated volume
    with the cross-shard stats [B, 1, 4] (gmax, mean, E[x^2], 0) and writes
    them once in out_dtype.  Returns [B, U1_local, U2]."""
    (B, M, U1, U2, md, W8, R, rq, rk, tq, tk, qp, ktp,
     mtable) = _fused_norm_sharded_prep(q, k, biases, grid_hw, io_dtype)
    scale = 1.0 / (md ** 0.5)
    scal = jnp.asarray([attn_clip, pos_w, agg_w, agg_b], jnp.float32)
    row0 = jnp.asarray([0 if q_row0 is None else q_row0], jnp.int32)
    return pl.pallas_call(
        functools.partial(_corr_norm_write_kernel, scale=scale, num_modes=M,
                          rq=rq, rk=rk, w8=W8, R=R, eps=eps),
        grid=(B, U1 // tq, U2 // tk),
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R + 1, W8, W8), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, tk), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, U1, U2), out_dtype),
        interpret=interpret,
    )(qp, ktp, mtable, scal, stats.astype(jnp.float32), row0)


# ---------------------------------------------------------------------------
# Kernel 2b: blockwise softmax probabilities (intra-frame attention)
# ---------------------------------------------------------------------------
#
# The intra site must *materialize* probs (they are reused by the aggregator
# every refinement iteration, update.py:129-156), but the XLA path also
# materializes the fp32 scores first.  This kernel computes row max/sum in a
# stats phase (no writes), then writes normalized probs directly in the output
# dtype — the [M, U, U] fp32 scores never exist.

def _probs_kernel_mt(q_ref, kt_ref, m_ref, scal_ref, row0_ref, out_ref,
                     mx_ref, l_ref, *, scale, nkv, rq, rk, w8, R, u2_valid):
    it = pl.program_id(1)
    ph = pl.program_id(2)
    kt = pl.program_id(3)

    @pl.when((ph == 0) & (kt == 0))
    def _():
        mx_ref[:] = jnp.full_like(mx_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    clip_val = scal_ref[0]
    pos_w = scal_ref[1]
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.clip(s, -clip_val, clip_val)
    # row0_ref: global W8-row offset of this shard's first query row
    # (sequence parallelism); 0 for the full self-attention.
    s = s + pos_w * _bias_tile_from_mtable(m_ref, row0_ref[0] + it * rq,
                                           kt * rk, rq, rk, w8, R)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kt * (rk * w8)
    s = jnp.where(col < u2_valid, s, NEG_INF)

    @pl.when(ph == 0)
    def _():
        m_prev = mx_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        l_ref[:] = l_ref[:] * jnp.exp(m_prev - m_new) + \
            jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True)
        mx_ref[:] = m_new

    @pl.when(ph == 1)
    def _():
        out_ref[0] = (jnp.exp(s - mx_ref[:]) / l_ref[:]).astype(out_ref.dtype)


def _probs_kernel_mt_q(q_ref, kt_ref, m_ref, scal_ref, row0_ref, out_ref,
                       sc_ref, mx_ref, l_ref, *, scale, nkv, rq, rk, w8, R,
                       u2_valid):
    """Quantized variant: writes round(exp(s - rowmax) * 127) as int8 plus
    the per-row dequant scale 1/(127 * l).  Every row's max exp is exactly
    1.0 -> 127, so diffuse rows survive quantization (a fixed global scale
    would round U~7000-token uniform rows to zero)."""
    it = pl.program_id(1)
    ph = pl.program_id(2)
    kt = pl.program_id(3)

    @pl.when((ph == 0) & (kt == 0))
    def _():
        mx_ref[:] = jnp.full_like(mx_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    clip_val = scal_ref[0]
    pos_w = scal_ref[1]
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.clip(s, -clip_val, clip_val)
    s = s + pos_w * _bias_tile_from_mtable(m_ref, row0_ref[0] + it * rq,
                                           kt * rk, rq, rk, w8, R)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kt * (rk * w8)
    s = jnp.where(col < u2_valid, s, NEG_INF)

    @pl.when(ph == 0)
    def _():
        m_prev = mx_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        l_ref[:] = l_ref[:] * jnp.exp(m_prev - m_new) + \
            jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True)
        mx_ref[:] = m_new

    @pl.when(ph == 1)
    def _():
        out_ref[0] = jnp.round(
            jnp.exp(s - mx_ref[:]) * 127.0).astype(jnp.int8)

        @pl.when(kt == 0)
        def _():
            sc_ref[0] = 1.0 / (127.0 * l_ref[:])


def mode_softmax_probs_mt(q, k, biases, grid_hw, clip_val, pos_w,
                          out_dtype=jnp.bfloat16, interpret=False,
                          io_dtype=jnp.float32, quantized=False,
                          q_row0=None):
    """probs[m] = softmax(clamp(scale q_m k_m^T) + pos_w * bias) without ever
    materializing fp32 scores.  Returns [M, U, U] in out_dtype.  Batched
    [B, M, ...] inputs fold B into the mode grid axis.

    quantized=True: returns (int8 [M, U, U] numerators round(exp*127),
    f32 [M, U, 1] per-row dequant scales 1/(127*l)) — probs = num * scale.
    Halves the bytes the per-iteration aggregate streams from HBM.

    q_row0: global W8-row offset of q's first row (traced int scalar) for
    sequence-parallel shards where q is a row slice (U1 = U2 / n_shards,
    shard-aligned to whole W8 rows); None/0 for the full self-attention."""
    (q, k), bm = _flatten_batch(q, k)
    M, U1, md = q.shape
    H8, W8 = grid_hw
    U2 = k.shape[1]
    assert U2 == H8 * W8 and U1 <= U2 and U1 % W8 == 0
    H8q = U1 // W8  # query rows held locally (== H8 unless row-sharded)
    R = (biases.shape[0] - 1) // 2
    scale = 1.0 / (md ** 0.5)
    # Prefer tile sizes that divide U exactly: the [M, U, U] output then needs
    # no unpad slice (a 396 MB copy at Sintel size).  Fall back to the padded
    # tiling when no aligned divisor exists.
    kdivs = [d for d in range(1, H8 + 1) if H8 % d == 0]
    qdivs = [d for d in range(1, H8q + 1) if H8q % d == 0]
    # Wide-k split measured fastest (tq=128, tk=640 at Sintel: 5.4 vs 6.5 ms
    # for the narrow-k divisor split and ~5.4 for the padded 256x512 tiling
    # which additionally costs the 396 MB unpad copy downstream).
    rk = max((d for d in kdivs if d * W8 <= 768 and (d * W8) % 128 == 0),
             default=None)
    rq = max((d for d in qdivs if d * W8 <= 256 and (d * W8) % 8 == 0),
             default=None)
    if rq is None or rk is None:
        rq = max(1, 256 // W8)
        rk = max(1, 512 // W8)
    tq, tk = rq * W8, rk * W8
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk
    qp = _pad_to(q, U1p, 1).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 1).astype(io_dtype), 1, 2)
    mtable = make_rowbias_table(biases, W8)

    nkv = U2p // tk
    grid = (M, U1p // tq, 2, nkv)
    in_specs = [
        pl.BlockSpec((1, tq, md), lambda m, i, p, j: (m, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, md, tk), lambda m, i, p, j: (m, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * R + 1, W8, W8), lambda m, i, p, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch = [
        pltpu.VMEM((tq, 1), jnp.float32),
        pltpu.VMEM((tq, 1), jnp.float32),
    ]
    # clip_val and pos_w ride SMEM so they may be traced values (the
    # custom-vjp training path passes tracers; functools.partial would bake
    # a leaked tracer into the kernel closure).
    args = (qp, ktp, mtable, jnp.asarray([clip_val, pos_w], jnp.float32),
            jnp.asarray([0 if q_row0 is None else q_row0], jnp.int32))

    if quantized:
        out, scales = pl.pallas_call(
            functools.partial(_probs_kernel_mt_q, scale=scale,
                              nkv=nkv, rq=rq, rk=rk, w8=W8, R=R,
                              u2_valid=U2),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, tq, tk), lambda m, i, p, j: (m, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, 1), lambda m, i, p, j: (m, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, U1p, U2p), jnp.int8),
                jax.ShapeDtypeStruct((M, U1p, 1), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        out = out[:, :U1, :U2]
        scales = scales[:, :U1]
        if bm:
            out = out.reshape(bm + out.shape[1:])
            scales = scales.reshape(bm + scales.shape[1:])
        return out, scales

    out = pl.pallas_call(
        functools.partial(_probs_kernel_mt, scale=scale,
                          nkv=nkv, rq=rq, rk=rk, w8=W8, R=R, u2_valid=U2),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tq, tk), lambda m, i, p, j: (m, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, U1p, U2p), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    out = out[:, :U1, :U2]
    return out.reshape(bm + out.shape[1:]) if bm else out


def _probs_kernel(q_ref, kt_ref, bias_ref, scal_ref, out_ref, mx_ref, l_ref,
                  *, scale, tk, u2_valid):
    """Dense-bias variant of _probs_kernel_mt: same two-phase (row stats,
    then normalized write) blockwise softmax, but the bias tile comes from a
    padded dense [U1p, U2p] table instead of the block-Toeplitz row table —
    the fallback when W8-multiples don't align to Mosaic's (8, 128) tiles
    (e.g. the 368x496 chairs training crop, W8=62)."""
    ph = pl.program_id(2)
    kt = pl.program_id(3)

    @pl.when((ph == 0) & (kt == 0))
    def _():
        mx_ref[:] = jnp.full_like(mx_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    clip_val = scal_ref[0]
    pos_w = scal_ref[1]
    s = jax.lax.dot_general(
        q_ref[0], kt_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.clip(s, -clip_val, clip_val)
    s = s + pos_w * bias_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kt * tk
    s = jnp.where(col < u2_valid, s, NEG_INF)

    @pl.when(ph == 0)
    def _():
        m_prev = mx_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        l_ref[:] = l_ref[:] * jnp.exp(m_prev - m_new) + \
            jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True)
        mx_ref[:] = m_new

    @pl.when(ph == 1)
    def _():
        out_ref[0] = (jnp.exp(s - mx_ref[:]) / l_ref[:]).astype(out_ref.dtype)


def mode_softmax_probs(q, k, bias, clip_val, pos_w, tq=256, tk=512,
                       out_dtype=jnp.bfloat16, interpret=False,
                       io_dtype=jnp.float32):
    """probs[m] = softmax(clamp(scale q_m k_m^T) + pos_w * bias) with a dense
    [U1, U2] bias table (or None) — the padded-tiling fallback for grids the
    block-Toeplitz kernel can't tile (see mt_alignment_ok).  Returns
    [M, U1, U2] in out_dtype; batched [B, M, ...] inputs fold B into the mode
    grid axis."""
    (q, k), bm = _flatten_batch(q, k)
    M, U1, md = q.shape
    U2 = k.shape[1]
    scale = 1.0 / (md ** 0.5)
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk
    qp = _pad_to(q, U1p, 1).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 1).astype(io_dtype), 1, 2)
    if bias is None:
        bias = jnp.zeros((U1, U2), jnp.float32)
    biasp = _pad_to(_pad_to(bias.astype(jnp.float32), U2p, 1), U1p, 0)

    nkv = U2p // tk
    grid = (M, U1p // tq, 2, nkv)
    out = pl.pallas_call(
        functools.partial(_probs_kernel, scale=scale, tk=tk,
                          u2_valid=U2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, md), lambda m, i, p, j: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md, tk), lambda m, i, p, j: (m, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, tk), lambda m, i, p, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, tk), lambda m, i, p, j: (m, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, U1p, U2p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, ktp, biasp, jnp.asarray([clip_val, pos_w], jnp.float32))
    out = out[:, :U1, :U2]
    return out.reshape(bm + out.shape[1:]) if bm else out


# ---------------------------------------------------------------------------
# Kernel 3: fused attentional-correlation volume
# ---------------------------------------------------------------------------

def _agg_corr_kernel(q_ref, kt_ref, bias_ref, scal_ref, out_ref, *, scale,
                     num_modes):
    # Grid: (batch, q_tiles, k_tiles); q_ref [1, M, TQ, md],
    # kt_ref [1, M, md, TK] (pre-transposed).
    # scal_ref: [4] = (clip_val, pos_w, agg_w, agg_b)
    clip_val = scal_ref[0]
    pos_w = scal_ref[1]
    agg_w = scal_ref[2]
    agg_b = scal_ref[3]

    bias = pos_w * bias_ref[:]
    # First pass over modes: accumulate softmax numerators stably.
    # Mode count is small (<=4 typical) — unrolled.
    ss = []
    for mode in range(num_modes):
        s = jax.lax.dot_general(
            q_ref[0, mode], kt_ref[0, mode],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.clip(s, -clip_val, clip_val) + bias
        ss.append(s)
    # LearnedSoftAggregate(num_feat=1): weights softmax(agg_w*s_m + agg_b)
    # over modes, elementwise (setrans.py:279-300).  agg_b cancels in the
    # softmax but is kept for exactness of intermediate magnitudes.
    logits = [agg_w * s + agg_b for s in ss]
    mmax = logits[0]
    for lg in logits[1:]:
        mmax = jnp.maximum(mmax, lg)
    exps = [jnp.exp(lg - mmax) for lg in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    acc = exps[0] * ss[0]
    for e, s in zip(exps[1:], ss[1:]):
        acc = acc + e * s
    out_ref[0] = acc / denom


def fused_agg_corr(q, k, bias, clip_val, pos_w, agg_w, agg_b,
                   tq=256, tk=512, interpret=False, io_dtype=jnp.float32):
    """The CRAFT inter-frame correlation volume in one pass.

    out[i, j] = sum_m softmax_m(agg_w * s_m[i,j] + agg_b) * s_m[i,j],
    s_m = clamp(scale * q_m k_m^T) + pos_w * bias.
    q, k: [M, U, md] or [B, M, U, md] (batch = leading grid axis);
    bias: [U1, U2] or None (shared across the batch).
    Returns [U1, U2] / [B, U1, U2] fp32.
    """
    batched = q.ndim == 4
    if not batched:
        q, k = q[None], k[None]
    B, M, U1, md = q.shape
    U2 = k.shape[2]
    scale = 1.0 / (md ** 0.5)
    U1p = ((U1 + tq - 1) // tq) * tq
    U2p = ((U2 + tk - 1) // tk) * tk
    qp = _pad_to(q, U1p, 2).astype(io_dtype)
    ktp = jnp.swapaxes(_pad_to(k, U2p, 2).astype(io_dtype), 2, 3)
    if bias is None:
        bias = jnp.zeros((U1, U2), jnp.float32)
    biasp = _pad_to(_pad_to(bias.astype(jnp.float32), U2p, 1), U1p, 0)
    scal = jnp.asarray([clip_val, pos_w, agg_w, agg_b], jnp.float32)

    grid = (B, U1p // tq, U2p // tk)
    out = pl.pallas_call(
        functools.partial(_agg_corr_kernel, scale=scale, num_modes=M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, tq, md), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, md, tk), lambda b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, tk), lambda b, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, tk), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, U1p, U2p), jnp.float32),
        interpret=interpret,
    )(qp, ktp, biasp, scal)
    out = out[:, :U1, :U2]
    return out if batched else out[0]
