"""Pallas windowed correlation-pyramid lookup.

TPU-native replacement for the reference's grid_sample window lookup
(core/corr.py:47-71) and for the XLA hat-matmul formulation
(ops/corr.py::corr_lookup_mxu).  The XLA formulation builds per-query
interpolation matrices in HBM — at Sintel size their write+read traffic is
~2x the pyramid itself, which is why it runs ~2.7x above the stream floor
(BENCH_NOTES.md round-2 measurements).

Kernel design (ONE fused kernel for all pyramid levels, grid over blocks of
TQ queries):
  * The y-pass for a block is ONE MXU dot per level:
        rows = BD_y [TQ*n, TQ*h_l] @ slabs [TQ*h_l, w_l]
    with BD_y a block-diagonal hat-weight matrix built in-kernel from the
    tap rows (by - r + j) via iotas — weights never touch HBM.  Taps whose
    sample row is outside the level see all-zero weights (grid_sample zero
    padding for free); levels are stored with sublane-aligned heights and
    zero pad rows (ops/corr.py::build_pyramid) so the [TQ, h_l, w_l] block
    is a free reshape of [TQ*h_l, w_l].
  * The x-pass is ONE lane-contraction dot per level against a full-lane
    hat matrix X_T [TQ*n, w_l] built in-kernel; the per-query [n, n]
    windows are the diagonal blocks of rows . X_T^T.
The MXU does ~TQ x the minimal useful work (block-diagonal waste), but the
only HBM traffic is the single pass over the pyramid, and per-block issue
count is 2 dots per level instead of 2*TQ tiny batched matmuls.

Matches corr_lookup_gather / the torch grid_sample pipeline to fp32
rounding (zeros padding, align_corners=True hat semantics), including
out-of-range queries (all-zero windows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(taps_ref, *refs, radius: int, shapes, D: int, tq: int):
    """Fused all-level lookup for a block of TQ queries.

    taps_ref: VMEM [TQ*n, 4*L] f32 — per level l the columns are
      (y tap in GLOBAL stacked-row coords, x tap col, global slab start row,
      global slab end row).  Globalized taps let the block-diagonal weight
      matrix be built with plain iotas — no integer div/mod on [M, K]
      tensors in the kernel.
    refs: L slab refs (VMEM [TQ*h_l, w_l*D], h_l sublane-aligned), then the
      output ref (VMEM [TQ, L*D, n, n] f32, channel order (l, d, i, j) with
      the kernel writing (j, i) — the caller transposes).
    """
    L = len(shapes)
    slab_refs, out_ref = refs[:L], refs[L]
    n = 2 * radius + 1
    f32 = jnp.float32
    M = tq * n

    for l, (h2, w2) in enumerate(shapes):
        dt = slab_refs[l].dtype
        K = tq * h2
        # Block-diagonal y hat weights in global stacked coordinates:
        # BD[a, b] = hat(tyg[a] - b) masked to a's own slab rows [lo, hi).
        b = jax.lax.broadcasted_iota(jnp.int32, (M, K), 1).astype(f32)
        tyg = taps_ref[:, 4 * l:4 * l + 1]      # [M, 1]
        lo = taps_ref[:, 4 * l + 2:4 * l + 3]   # [M, 1]
        hi = taps_ref[:, 4 * l + 3:4 * l + 4]   # [M, 1]
        bd = jnp.maximum(0.0, 1.0 - jnp.abs(tyg - b)) * \
            ((b >= lo) & (b < hi)).astype(f32)
        rows = jnp.dot(bd.astype(dt), slab_refs[l][:],
                       preferred_element_type=f32)  # [M, w2*D]

        # x-pass: X_T[c, x_col] = hat(tx[c] - x(x_col)); contract lanes.
        tx = taps_ref[:, 4 * l + 1:4 * l + 2]  # [M, 1]
        rows = rows.astype(dt)
        if D == 1:
            x_of = jax.lax.broadcasted_iota(jnp.int32, (M, w2), 1) \
                .astype(f32)
        else:
            xs = jax.lax.broadcasted_iota(jnp.int32, (M, w2 * D), 1)
            x_of = (xs // D).astype(f32)
        for d in range(D):
            x_hat = jnp.maximum(0.0, 1.0 - jnp.abs(tx - x_of))
            if D > 1:
                x_hat = x_hat * ((xs % D) == d).astype(f32)
            full = jax.lax.dot_general(
                rows, x_hat.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)  # [M(j), M(i)]
            for q in range(tq):
                # out[q, l*D+d, i, j] = full[q*n + j, q*n + i]; stored (j, i).
                out_ref[q, l * D + d] = \
                    full[q * n:(q + 1) * n, q * n:(q + 1) * n]


@functools.partial(jax.jit, static_argnames=("radius", "D", "tq",
                                             "interpret"))
def _lookup_all_levels(levels, taps, radius: int, D: int, tq: int,
                       interpret: bool):
    """levels: tuple of [Q, h_l, w_l*D] (h_l % 8 == 0); taps: [Q*n, 2*L].
    Returns [Q, L*D, n, n] f32 in kernel (j, i) order."""
    L = len(levels)
    Q = levels[0].shape[0]
    n = 2 * radius + 1
    shapes = tuple((l.shape[1], l.shape[2] // D) for l in levels)

    flat_levels = [l.reshape(Q * l.shape[1], l.shape[2]) for l in levels]

    kernel = functools.partial(_lookup_kernel, radius=radius, shapes=shapes,
                               D=D, tq=tq)

    def slab_spec(h, wD):
        return pl.BlockSpec((tq * h, wD), lambda i: (i, 0))

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(Q, tq),),
        in_specs=[pl.BlockSpec((tq * n, 4 * L), lambda i: (i, 0))] +
                 [slab_spec(h, lvl.shape[1])
                  for (h, _), lvl in zip(shapes, flat_levels)],
        out_specs=pl.BlockSpec((tq, L * D, n, n), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, L * D, n, n), jnp.float32),
        interpret=interpret,
    )(taps, *flat_levels)


def _pick_tq(Q: int) -> int:
    for tq in (16, 8, 4, 2):
        if Q % tq == 0:
            return tq
    return 1


def corr_lookup_pallas(pyr, coords, interpret: bool = False) -> jnp.ndarray:
    """Windowed multi-scale lookup over a CorrPyramid (drop-in for
    corr_lookup_mxu; reference corr.py:47-71 channel order).

    Requires sublane-aligned level heights (build_pyramid pads with zero
    rows, which reproduce grid_sample zero padding exactly)."""
    r = pyr.radius
    B, H1, W1, _ = coords.shape
    Q = B * H1 * W1
    n = 2 * r + 1
    L = len(pyr.levels)
    flat = coords.reshape(Q, 2)
    tq = _pick_tq(Q)
    # Zero rows beyond the logical height hold exactly the grid_sample
    # zero-padding value, so results are unchanged; h % 8 == 0 makes the
    # [Q, h, w] -> [Q*h, w] reshape layout-free.
    pyr = pyr._replace(levels=tuple(
        jnp.pad(l, ((0, 0), (0, (-l.shape[1]) % 8), (0, 0)))
        for l in pyr.levels))

    offs = jnp.arange(n, dtype=jnp.float32)[None] - r  # [1, n]
    # Block-relative query index: the kernel's stacked slabs restart at
    # every TQ-query block.
    q_rel = (jnp.arange(Q, dtype=jnp.float32) % tq)[:, None]  # [Q, 1]
    ones = jnp.ones((1, n), jnp.float32)
    taps = []
    for i in range(L):
        h_l = pyr.levels[i].shape[1]
        base = flat / (2.0 ** i)
        lo = q_rel * h_l                       # [Q, 1]
        taps.append(lo + base[:, 1:2] + offs)  # y taps, global stacked rows
        taps.append(base[:, 0:1] + offs)       # x tap cols [Q, n]
        taps.append(lo * ones)                 # slab start row
        taps.append((lo + h_l) * ones)         # slab end row
    # [Q, 4L, n] -> [Q, n, 4L] -> [Q*n, 4L]
    taps = jnp.stack(taps, axis=1).transpose(0, 2, 1).reshape(Q * n, 4 * L)

    out = _lookup_all_levels(tuple(pyr.levels), taps, r, pyr.dim, tq,
                             interpret)
    # Kernel emits (l, d, j, i); reference channel order is (l, d, i, j).
    out = out.transpose(0, 1, 3, 2).reshape(Q, L * pyr.dim * n * n)
    return out.reshape(B, H1, W1, -1)


# --- differentiable wrapper: Pallas forward, XLA backward -------------------
# coords are stop_gradient'ed before the lookup in the refinement scan
# (parity with coords1.detach(), network.py:232), so only the pyramid levels
# need a gradient.  The backward is the VJP of the mathematically identical
# XLA hat-matmul formulation.

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _lookup_diff(levels, coords, batch, h1, w1, radius, dim, interpret):
    from craft_tpu.ops.corr import CorrPyramid

    pyr = CorrPyramid(levels=levels, batch=batch, h1=h1, w1=w1,
                      radius=radius, dim=dim)
    return corr_lookup_pallas(pyr, coords, interpret=interpret)


def _lookup_fwd(levels, coords, batch, h1, w1, radius, dim, interpret):
    out = _lookup_diff(levels, coords, batch, h1, w1, radius, dim, interpret)
    return out, (levels, coords)


def _lookup_bwd(batch, h1, w1, radius, dim, interpret, res, g):
    from craft_tpu.ops.corr import CorrPyramid, corr_lookup_mxu

    levels, coords = res

    def ref_fn(lvls):
        pyr = CorrPyramid(levels=lvls, batch=batch, h1=h1, w1=w1,
                          radius=radius, dim=dim)
        return corr_lookup_mxu(pyr, coords)

    _, vjp = jax.vjp(ref_fn, levels)
    (dlevels,) = vjp(g)
    return dlevels, jnp.zeros_like(coords)


_lookup_diff.defvjp(_lookup_fwd, _lookup_bwd)


def corr_lookup_tpu(pyr, coords, interpret: bool = False) -> jnp.ndarray:
    """Differentiable Pallas lookup (training-safe drop-in)."""
    return _lookup_diff(pyr.levels, coords, pyr.batch, pyr.h1, pyr.w1,
                        pyr.radius, pyr.dim, interpret)
