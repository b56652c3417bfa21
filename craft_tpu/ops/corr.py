"""All-pairs correlation volume, pyramid, and windowed lookup.

TPU-native redesign of the reference correlation engine (core/corr.py:16-207):
the volume is built with one big MXU matmul, pooled into a 4-level pyramid, and
the per-iteration (2r+1)^2-tap bilinear window lookup runs as batched MXU
matmuls with hat-function interpolation matrices (corr_lookup_mxu — the
measured-fastest of four formulations, see BENCH_NOTES.md).

Layout: feature maps are NHWC; pyramid level i is stored 3-D as
[B*H1*W1, h2_i, w2_i * D] where D = 1 (one-way) or 2 (two-way f1+f2
correlation) — see CorrPyramid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from craft_tpu.ops.geometry import avg_pool2x2, bilinear_sample


class CorrPyramid(NamedTuple):
    """Correlation pyramid + metadata, carried through the refinement scan.

    Levels are stored 3-D as [B*H1*W1, h2_i, w2_i * D] (D folded into the lane
    axis) — a trailing size-1 D axis would force a physical relayout copy of
    the whole level on every scan iteration (T(8,128) tiling).
    """
    levels: tuple  # tuple of [B*H1*W1, h2_i, w2_i * D] arrays
    batch: int
    h1: int
    w1: int
    radius: int
    dim: int = 1  # D

    def lookup(self, coords: jnp.ndarray) -> jnp.ndarray:
        return corr_lookup(self, coords)


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """[B, H1*W1, H2*W2] dot-product correlation scaled by 1/sqrt(dim)
    (reference corr.py:73-81).  Inputs NHWC; computed in fp32 on the MXU."""
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C).astype(jnp.float32)
    f2 = fmap2.reshape(B, H * W, C).astype(jnp.float32)
    corr = jnp.einsum("bic,bjc->bij", f1, f2, preferred_element_type=jnp.float32)
    return corr / jnp.sqrt(jnp.float32(C))


def global_layer_norm(vol: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Layer-norm over the flattened (H1*W1*H2*W2) volume per (batch, dim) slice
    (reference corr.py:27-30, 200-204).  vol: [B, D, N] with N the flat volume.

    TPU note: the N axis is reduced in two stages via a [B, D, N/128, 128]
    view so the reduction keeps full lanes."""
    B, D, N = vol.shape
    if N % 128 == 0:
        v = vol.reshape(B, D, N // 128, 128)
        mean = jnp.mean(v, axis=(-2, -1))[..., None]
        var = jnp.mean(jnp.square(v - mean[..., None]),
                       axis=(-2, -1))[..., None]
    else:
        mean = jnp.mean(vol, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vol - mean), axis=-1, keepdims=True)
    return (vol - mean) * jax.lax.rsqrt(var + eps)


def build_pyramid(
    corr: jnp.ndarray,
    batch: int,
    h1: int,
    w1: int,
    num_levels: int = 4,
    radius: int = 4,
    do_global_norm: bool = False,
    level_dtype=jnp.float32,
) -> CorrPyramid:
    """Build the avg-pool-2 pyramid from a correlation volume.

    Args:
      corr: [B, H1*W1, D, H2*W2] (D=1 for plain corr; D=2 for two-way CRAFT corr).
      level_dtype: storage dtype for pyramid levels.  bfloat16 halves the HBM
        traffic of the 12 windowed lookups; measured end-to-end flow deviation
        vs the fp32 torch reference is < 5e-3 px over 12 iterations (pooling
        and normalization still run in fp32).
    """
    from craft_tpu.parallel.sp import sp_shard

    B, U1, D, U2 = corr.shape
    h2, w2 = h1, w1
    assert U1 == h1 * w1 and U2 == h2 * w2

    corr = sp_shard(corr, 1)  # query-row axis over the seq mesh (no-op
    # outside a sequence_parallel context, parallel/sp.py)
    if do_global_norm:
        # Normalize over (U1, U2) jointly per (batch, dim) as the reference does.
        v = corr.transpose(0, 2, 1, 3).reshape(B, D, U1 * U2)
        v = global_layer_norm(v)
        corr = v.reshape(B, D, U1, U2).transpose(0, 2, 1, 3)

    if D == 1:
        base = sp_shard(corr.reshape(B * U1, h2, w2), 0)  # free reshape
        levels = [base]
        for _ in range(num_levels - 1):
            levels.append(sp_shard(jax.lax.reduce_window(
                levels[-1], 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2),
                "VALID") / 4.0, 0))
    else:
        base4 = sp_shard(corr.reshape(B * U1, D, h2, w2).transpose(0, 2, 3, 1),
                         0)
        levels4 = [base4]
        for _ in range(num_levels - 1):
            levels4.append(sp_shard(avg_pool2x2(levels4[-1]), 0))
        levels = [l.reshape(l.shape[0], l.shape[1], l.shape[2] * D)
                  for l in levels4]
    levels = [l.astype(level_dtype) for l in levels]
    return CorrPyramid(levels=tuple(levels), batch=batch, h1=h1, w1=w1,
                       radius=radius, dim=D)


def pyramid_from_level0(
    level0: jnp.ndarray,
    batch: int,
    h1: int,
    w1: int,
    num_levels: int = 4,
    radius: int = 4,
    level_dtype=jnp.bfloat16,
) -> CorrPyramid:
    """Pyramid from an already-normalized base volume (the fused
    clamp+norm Pallas kernel writes level 0 directly; see
    ops/pallas/mode_attention.py::fused_agg_corr_norm_mt).

    level0: [B, U1, U2] in level_dtype.  Pooling accumulates in fp32 via
    strided slices (elementwise adds fuse with the dtype converts — a
    reduce_window on a converted copy would materialize the volume in fp32
    again)."""
    B, U1, U2 = level0.shape
    base = level0.reshape(B * U1, h1, w1)
    levels = [base.astype(level_dtype)]
    cur = base
    for _ in range(num_levels - 1):
        h, w = (cur.shape[1] // 2) * 2, (cur.shape[2] // 2) * 2
        c = cur[:, :h, :w].astype(jnp.float32)
        cur = ((c[:, 0::2, 0::2] + c[:, 1::2, 0::2]
                + c[:, 0::2, 1::2] + c[:, 1::2, 1::2]) * 0.25).astype(
            level_dtype)
        levels.append(cur)
    return CorrPyramid(levels=tuple(levels), batch=batch, h1=h1, w1=w1,
                       radius=radius, dim=1)


def plain_corr_pyramid(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    num_levels: int = 4,
    radius: int = 4,
    do_global_norm: bool = False,
    level_dtype=jnp.float32,
) -> CorrPyramid:
    """RAFT CorrBlock volume construction (reference corr.py:16-45)."""
    B, H, W, _ = fmap1.shape
    corr = all_pairs_correlation(fmap1, fmap2)[:, :, None, :]  # [B, U1, 1, U2]
    return build_pyramid(corr, B, H, W, num_levels, radius, do_global_norm,
                         level_dtype=level_dtype)


class PackedPyramid(NamedTuple):
    """All pyramid levels concatenated on the row axis, width zero-padded to
    level 0's — enables the windowed lookup as ONE batched matmul pair per
    query instead of one per level (4x fewer MXU dispatches in the scan;
    the per-level tiny matmuls are dispatch-latency-bound)."""

    packed: jnp.ndarray  # [Q, sum(h_l), w_0]
    heights: tuple
    widths: tuple
    offsets: tuple  # row offset of each level in `packed`
    batch: int
    h1: int
    w1: int
    radius: int


def pack_pyramid(pyr: CorrPyramid) -> PackedPyramid:
    """Concatenate D=1 pyramid levels into the packed layout (one copy per
    forward, outside the refinement scan)."""
    assert pyr.dim == 1, "packed lookup supports one-way correlation"
    w0 = pyr.levels[0].shape[2]
    heights, widths, offsets, parts = [], [], [], []
    off = 0
    for lvl in pyr.levels:
        h, w = lvl.shape[1], lvl.shape[2]
        heights.append(h)
        widths.append(w)
        offsets.append(off)
        off += h
        parts.append(jnp.pad(lvl, ((0, 0), (0, 0), (0, w0 - w))))
    return PackedPyramid(packed=jnp.concatenate(parts, axis=1),
                         heights=tuple(heights), widths=tuple(widths),
                         offsets=tuple(offsets), batch=pyr.batch,
                         h1=pyr.h1, w1=pyr.w1, radius=pyr.radius)


def corr_lookup_packed(pp: PackedPyramid, coords: jnp.ndarray) -> jnp.ndarray:
    """Windowed multi-scale lookup over the packed pyramid.

    Builds block-diagonal interpolation matrices spanning all levels so the
    whole lookup is two batched matmuls:
        rows = Wy_cat [Q, L*n, Htot] @ packed [Q, Htot, w0]
        full = Wx_cat [Q, L*n, w0] . rows^T  ->  [Q, L*n, L*n]
    and the per-level windows are the diagonal (i, j) blocks of `full` (the
    off-diagonal cross-level blocks are discarded).  Bit-identical to
    corr_lookup_mxu / the reference grid_sample lookup.
    """
    r = pp.radius
    B, H1, W1, _ = coords.shape
    n = 2 * r + 1
    L = len(pp.heights)
    Q = B * H1 * W1
    flat = coords.reshape(Q, 2)
    dt = pp.packed.dtype
    Htot = pp.packed.shape[1]
    w0 = pp.packed.shape[2]

    wy_parts, wx_parts = [], []
    for i, (h, w, off) in enumerate(zip(pp.heights, pp.widths, pp.offsets)):
        base = flat / (2.0 ** i)
        wy = _hat_weights(base[:, 1], r, h)  # [Q, n, h]
        wy_parts.append(jnp.pad(wy, ((0, 0), (0, 0),
                                     (off, Htot - off - h))))
        wx = _hat_weights(base[:, 0], r, w)  # [Q, n, w]
        wx_parts.append(jnp.pad(wx, ((0, 0), (0, 0), (0, w0 - w))))
    Wy = jnp.concatenate(wy_parts, axis=1).astype(dt)  # [Q, L*n, Htot]
    Wx = jnp.concatenate(wx_parts, axis=1).astype(dt)  # [Q, L*n, w0]

    rows = jnp.einsum("qjh,qhw->qjw", Wy, pp.packed,
                      preferred_element_type=jnp.float32).astype(dt)
    full = jnp.einsum("qiw,qjw->qij", Wx, rows,
                      preferred_element_type=jnp.float32)  # [Q, Ln, Ln]

    out = []
    for l in range(L):
        blk = full[:, l * n:(l + 1) * n, l * n:(l + 1) * n]  # [Q, n_i, n_j]
        out.append(blk.reshape(B, H1, W1, n * n))
    return jnp.concatenate(out, axis=-1).astype(jnp.float32)


def _hat_weights(base: jnp.ndarray, radius: int, size: int) -> jnp.ndarray:
    """Bilinear interpolation matrix via the hat function.

    For each query base position p (fractional) and window offset t in
    [-r, r], the sampled value at (p + t) equals
        sum_k hat(p + t - k) * line[k],   hat(d) = max(0, 1 - |d|),
    which reproduces grid_sample(align_corners=True, zeros padding) exactly,
    including out-of-bounds taps fading to zero.  Returns [Q, n, size].
    """
    n = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    pos = base[:, None] + offs[None, :]  # [Q, n]
    grid = jnp.arange(size, dtype=jnp.float32)
    d = jnp.abs(pos[:, :, None] - grid[None, None, :])
    return jnp.maximum(0.0, 1.0 - d)


def corr_lookup_mxu(pyr: CorrPyramid, coords: jnp.ndarray) -> jnp.ndarray:
    """Windowed multi-scale lookup as batched MXU matmuls — no gathers.

    TPU-native redesign of the reference's grid_sample lookup (corr.py:47-71):
    instead of gathering 4*(2r+1)^2 bilinear taps per query (scatter/gather is
    the slowest path on TPU), build per-query interpolation matrices
    Wy [Q, n, h2] and Wx [Q, n, w2] from the hat function and contract
        out[q, d, i, j] = Wx[q,i,:] . corr[q,:,:,d] . Wy[q,j,:]^T
    — two batched matmuls per level that run on the systolic array.
    Channel order matches the reference exactly (level-major, then d, then
    x-offset i, then y-offset j).
    """
    r = pyr.radius
    B, H1, W1, _ = coords.shape
    n = 2 * r + 1
    Q = B * H1 * W1
    flat = coords.reshape(Q, 2)

    out = []
    D = pyr.dim
    for i, level in enumerate(pyr.levels):
        h2, w2 = level.shape[1], level.shape[2] // D
        base = flat / (2.0 ** i)
        # Weights in the level's dtype so bf16 levels hit the bf16 MXU path
        # (accumulation stays fp32 via preferred_element_type).
        Wx = _hat_weights(base[:, 0], r, w2).astype(level.dtype)
        Wy = _hat_weights(base[:, 1], r, h2).astype(level.dtype)
        if D == 1:
            # Contract the lane-aligned w axis first (K = w2, e.g. 128 at
            # Sintel size) — measured ~11% faster than rows-first.
            cols = jnp.einsum("qiw,qhw->qih", Wx, level,
                              preferred_element_type=jnp.float32)
            cols = cols.astype(level.dtype)
            win = jnp.einsum("qjh,qih->qij", Wy, cols,
                             preferred_element_type=jnp.float32)
            out.append(win.reshape(B, H1, W1, n * n))
        else:
            # [Q, n, h2] @ [Q, h2, w2*D] -> [Q, n, w2*D]
            rows = jnp.einsum("qjh,qhx->qjx", Wy, level,
                              preferred_element_type=jnp.float32)
            rows = rows.astype(level.dtype).reshape(Q, n, w2, D)
            # [Q, n_i, w2] . [Q, n_j, w2, D] -> [Q, D, n_i, n_j]
            win = jnp.einsum("qiw,qjwd->qdij", Wx, rows,
                             preferred_element_type=jnp.float32)
            out.append(win.reshape(B, H1, W1, D * n * n))
    return jnp.concatenate(out, axis=-1).astype(jnp.float32)


def corr_lookup_lerp(pyr: CorrPyramid, coords: jnp.ndarray) -> jnp.ndarray:
    """Matmul-free windowed lookup: aligned row/column gathers + constant-
    fraction lerps.

    Because all (2r+1) taps of a query share the same fractional offset, the
    bilinear combination collapses to ONE lerp between adjacent gathered
    rows/columns — no per-query interpolation matrices, no MXU-latency-bound
    tiny batched matmuls (which dominate corr_lookup_mxu).  Out-of-bounds rows
    are zero-masked, reproducing grid_sample zero padding exactly.
    """
    r = pyr.radius
    B, H1, W1, _ = coords.shape
    n = 2 * r + 1
    w = n + 1
    Q = B * H1 * W1
    D = pyr.dim
    flat = coords.reshape(Q, 2)
    t_idx = jnp.arange(w)

    out = []
    for i, level in enumerate(pyr.levels):
        h2, w2 = level.shape[1], level.shape[2] // D
        base = flat / (2.0 ** i)
        bx, by = base[:, 0], base[:, 1]

        # --- y pass: gather w aligned rows, zero-mask OOB, lerp ---
        y0 = jnp.floor(by)
        fy = (by - y0).astype(level.dtype)[:, None, None]
        ridx = y0.astype(jnp.int32)[:, None] - r + t_idx[None]  # [Q, w]
        rvalid = ((ridx >= 0) & (ridx < h2))
        g = jnp.take_along_axis(level, jnp.clip(ridx, 0, h2 - 1)[:, :, None],
                                axis=1)  # [Q, w, w2*D]
        g = g * rvalid[:, :, None].astype(level.dtype)
        rows = (1 - fy) * g[:, :n] + fy * g[:, 1:]  # [Q, n, w2*D]

        # --- x pass: transpose so columns land on sublanes, gather, lerp ---
        rows = rows.reshape(Q, n, w2, D).transpose(0, 2, 1, 3)  # [Q,w2,n,D]
        rows = rows.reshape(Q, w2, n * D)
        x0 = jnp.floor(bx)
        fx = (bx - x0).astype(level.dtype)[:, None, None]
        cidx = x0.astype(jnp.int32)[:, None] - r + t_idx[None]
        cvalid = ((cidx >= 0) & (cidx < w2))
        gc = jnp.take_along_axis(rows, jnp.clip(cidx, 0, w2 - 1)[:, :, None],
                                 axis=1)  # [Q, w, n*D]
        gc = gc * cvalid[:, :, None].astype(level.dtype)
        cols = (1 - fx) * gc[:, :n] + fx * gc[:, 1:]  # [Q, n_i, n_j*D]

        # layout: cols[q, i, j, d] -> reference channel order (d, i, j).
        win = cols.reshape(Q, n, n, D).transpose(0, 3, 1, 2)
        out.append(win.reshape(B, H1, W1, D * n * n).astype(jnp.float32))
    return jnp.concatenate(out, axis=-1)


def corr_lookup_window(pyr: CorrPyramid, coords: jnp.ndarray) -> jnp.ndarray:
    """Windowed lookup via row/column window gathers + small hat matmuls.

    Moves only the (2r+2)-row window per query (~40 MB at Sintel size vs the
    ~200 MB full-slab reads of corr_lookup_mxu), then contracts with compact
    [n, 2r+2] hat-weight matrices.  Bit-identical to the other lookups.
    """
    r = pyr.radius
    B, H1, W1, _ = coords.shape
    n = 2 * r + 1
    w = n + 1  # window rows/cols needed to cover all taps
    Q = B * H1 * W1
    flat = coords.reshape(Q, 2)
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

    out = []
    D = pyr.dim
    for i, level in enumerate(pyr.levels):
        h2, w2 = level.shape[1], level.shape[2] // D
        base = flat / (2.0 ** i)
        bx, by = base[:, 0], base[:, 1]

        def window_weights(b, size):
            # b: [Q] fractional base.  Window start s = clamp(floor(b)-r).
            s = jnp.clip(jnp.floor(b) - r, 0, max(size - w, 0))
            ks = s[:, None] + jnp.arange(w, dtype=jnp.float32)[None]  # [Q, w]
            pos = b[:, None] + offs[None]  # [Q, n]
            d = jnp.abs(pos[:, :, None] - ks[:, None, :])
            wts = jnp.maximum(0.0, 1.0 - d)
            # Zero weights for window slots beyond the level (their gathered
            # rows are clamped duplicates, not zero padding).
            wts = wts * (ks[:, None, :] < size)
            return wts, s.astype(jnp.int32)

        wy, sy = window_weights(by, h2)  # [Q, n, w], [Q]
        wx, sx = window_weights(bx, w2)

        ridx = jnp.clip(sy[:, None] + jnp.arange(w)[None], 0, h2 - 1)
        rows = jnp.take_along_axis(level, ridx[:, :, None], axis=1)  # [Q,w,w2D]
        rows = jnp.einsum("qjt,qtx->qjx", wy, rows,
                          preferred_element_type=jnp.float32)
        rows = rows.reshape(Q, n, w2, D)

        cidx = jnp.clip(sx[:, None] + jnp.arange(w)[None], 0, w2 - 1)
        cols = jnp.take_along_axis(
            rows, cidx[:, None, :, None], axis=2)  # [Q, n, w, D]
        win = jnp.einsum("qit,qjtd->qdij", wx, cols,
                         preferred_element_type=jnp.float32)
        out.append(win.reshape(B, H1, W1, D * n * n))
    return jnp.concatenate(out, axis=-1).astype(jnp.float32)


def corr_lookup_gather(pyr: CorrPyramid, coords: jnp.ndarray) -> jnp.ndarray:
    """Windowed multi-scale lookup (reference corr.py:47-71).

    Args:
      coords: [B, H1, W1, 2] current coords1 in (x, y) order at 1/8 resolution.
    Returns:
      [B, H1, W1, L*D*(2r+1)^2] fp32 features.  Channel order matches the
      reference exactly: level-major, then (D, dx-row, dy-col) — the reference
      builds the window as meshgrid(dy, dx) added to (x, y) coords so the first
      window axis offsets x and the second offsets y (corr.py:55-61).
    """
    r = pyr.radius
    B, H1, W1, _ = coords.shape
    n = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # Window: axis 0 offsets x, axis 1 offsets y (see docstring).
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")
    delta = jnp.stack([ox, oy], axis=-1)  # [n, n, 2] (x-offset, y-offset)

    flat_coords = coords.reshape(B * H1 * W1, 1, 1, 2)

    out = []
    D = pyr.dim
    for i, level in enumerate(pyr.levels):
        level = level.reshape(level.shape[0], level.shape[1],
                              level.shape[2] // D, D)
        centroid = flat_coords / (2.0 ** i)
        window = centroid + delta[None]  # [BU1, n, n, 2]
        # level: [BU1, h2, w2, D] -> sampled [BU1, n, n, D]
        sampled = bilinear_sample(level, window)
        # Reference channel layout within a level: view(batch,h1,w1,-1) of
        # [BU1, D, n, n] (NCHW) => order (D, wx, wy).
        sampled = sampled.transpose(0, 3, 1, 2).reshape(B, H1, W1, D * n * n)
        out.append(sampled)
    return jnp.concatenate(out, axis=-1).astype(jnp.float32)


# Default lookup: the MXU matmul formulation (gather version kept for
# cross-checking in tests).
corr_lookup = corr_lookup_mxu
