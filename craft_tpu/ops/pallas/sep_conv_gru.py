"""Fused SepConvGRU passes as Pallas TPU kernels.

The reference SepConvGRU (update.py:37-64) runs six 1x5/5x1 convs + gates per
refinement iteration.  XLA executes each conv as a separate pass over the
[B, H, W, 512] input at ~6 TF/s (the 46x62 training grid maps W=62 onto the
128-lane axis, wasting half the hardware, and every conv re-streams the
input).  Here one kernel per directional pass:

  * flattens spatial to rows ([H*W, C]: spatial on sublanes, channels on
    lanes — MXU-natural [rows, Cin] @ [Cin, Cout] tap matmuls),
  * computes all three gate convs + the sigmoid/tanh/update elementwise
    chain in-kernel, reading each input row once per tile,
  * expresses the 5-tap SAME conv as statically-shifted row slices (tap
    validity masks only for the horizontal pass, where shifts cross
    image-row boundaries),
  * tiles the row axis (grid = (B, n_tiles)); each step assembles an
    extended region from (prev, cur, next) tile blocks — clamped index maps
    at the edges feed junk only into outputs that land in the zero padding
    and are discarded.

A custom VJP pairs it with a backward kernel: conv-transpose = shifted
slices with flipped offsets; weight gradients are [Cin, rows] x [rows, Cout]
contractions accumulated across the whole grid (constant output index =
contiguous revisits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = 5
RAD = TAPS // 2  # tap radius


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def plan_tiles(HW: int, stride: int, budget_rows: int = 1024):
    """(T, n): tile rows (multiple of 8, >= 4*stride) and tile count such
    that n*T >= 4*stride + HW + 4*stride (front/back zero pad included)."""
    need = HW + 8 * stride
    T = max(_round_up(4 * stride, 8), min(_round_up(need, 8), budget_rows))
    T = _round_up(T, 8)
    n = -(-need // T)
    return T, n


def _wmask(rows: int, W: int, off: int, d0):
    """[rows, 1] bool: horizontal tap at offset `off` stays inside its image
    row.  d0 = data-row index of the first row (may be traced/negative; pad
    rows produce don't-care values that land in discarded outputs)."""
    d = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + d0
    w = ((d % W) + W) % W
    return (w + off >= 0) & (w + off < W)


def _ext(prev_ref, cur_ref, next_ref, halo: int):
    """[T+2*halo, C] region assembled from three consecutive tile blocks."""
    T = cur_ref.shape[1]
    return jnp.concatenate(
        [prev_ref[0, T - halo:, :], cur_ref[0], next_ref[0, :halo, :]],
        axis=0)


def _gru_fwd_kernel(hp_p, hp_c, hp_n, xp_p, xp_c, xp_n,
                    wzh_ref, wzx_ref, wrh_ref, wrx_ref, wqh_ref, wqx_ref,
                    b_ref, hout_ref, z_ref, r_ref, q_ref,
                    *, s, width, T, pad, masked):
    """One tile of one directional pass.  Region coordinates: ext row e maps
    to padded row i*T - 4s + e; tile-center outputs are ext rows
    [4s, 4s + T)."""
    i = pl.program_id(1)
    Ch = hout_ref.shape[-1]
    dots = functools.partial(jax.lax.dot_general,
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    eh = _ext(hp_p, hp_c, hp_n, 4 * s)   # [T + 8s, Ch]
    ex = _ext(xp_p, xp_c, xp_n, 4 * s)   # [T + 8s, Cx]
    # data-row index of region row 0 (region = ext rows [2s, T+6s)).
    reg0 = i * T - 2 * s - pad
    Tr = T + 4 * s

    accz = jnp.zeros((Tr, Ch), jnp.float32)
    accr = jnp.zeros_like(accz)
    for t in range(TAPS):
        o = (t - RAD) * s
        sh = eh[2 * s + o:2 * s + o + Tr, :]
        sx = ex[2 * s + o:2 * s + o + Tr, :]
        if masked and o != 0:
            m = _wmask(Tr, width, o, reg0)
            sh = jnp.where(m, sh, 0)
            sx = jnp.where(m, sx, 0)
        accz = accz + dots(sh, wzh_ref[t]) + dots(sx, wzx_ref[t])
        accr = accr + dots(sh, wrh_ref[t]) + dots(sx, wrx_ref[t])
    z = jax.nn.sigmoid(accz + b_ref[0:1, :])       # region rows
    r = jax.nn.sigmoid(accr + b_ref[1:2, :])
    rh = (r * eh[2 * s:2 * s + Tr, :].astype(jnp.float32)).astype(eh.dtype)

    accq = jnp.zeros((T, Ch), jnp.float32)
    cen0 = reg0 + 2 * s  # data-row index of the first center row
    for t in range(TAPS):
        o = (t - RAD) * s
        srh = rh[2 * s + o:2 * s + o + T, :]
        sx = ex[4 * s + o:4 * s + o + T, :]
        if masked and o != 0:
            m = _wmask(T, width, o, cen0)
            srh = jnp.where(m, srh, 0)
            sx = jnp.where(m, sx, 0)
        accq = accq + dots(srh, wqh_ref[t]) + dots(sx, wqx_ref[t])
    q = jnp.tanh(accq + b_ref[2:3, :])

    zc = z[2 * s:2 * s + T, :]
    rc = r[2 * s:2 * s + T, :]
    hc = eh[4 * s:4 * s + T, :].astype(jnp.float32)
    hout_ref[0] = ((1.0 - zc) * hc + zc * q).astype(hout_ref.dtype)
    z_ref[0] = zc.astype(z_ref.dtype)
    r_ref[0] = rc.astype(r_ref.dtype)
    q_ref[0] = q.astype(q_ref.dtype)


def _gru_bwd_kernel(hp_p, hp_c, hp_n, xp_p, xp_c, xp_n,
                    z_p, z_c, z_n, r_p, r_c, r_n, q_p, q_c, q_n,
                    g_p, g_c, g_n,
                    wzh_ref, wzx_ref, wrh_ref, wrx_ref, wqh_ref, wqx_ref,
                    dh_ref, dx_ref, dwzh_ref, dwzx_ref, dwrh_ref, dwrx_ref,
                    dwqh_ref, dwqx_ref, db_ref,
                    *, s, width, T, pad, masked):
    b = pl.program_id(0)
    i = pl.program_id(1)
    Ch = dh_ref.shape[-1]
    dot_f = functools.partial(jax.lax.dot_general,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dot_t = functools.partial(jax.lax.dot_general,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dot_w = functools.partial(jax.lax.dot_general,
                              dimension_numbers=(((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when((b == 0) & (i == 0))
    def _():
        for ref in (dwzh_ref, dwzx_ref, dwrh_ref, dwrx_ref, dwqh_ref,
                    dwqx_ref, db_ref):
            ref[...] = jnp.zeros_like(ref)

    E = T + 8 * s
    eh = _ext(hp_p, hp_c, hp_n, 4 * s)
    ex = _ext(xp_p, xp_c, xp_n, 4 * s)
    ez = _ext(z_p, z_c, z_n, 4 * s).astype(jnp.float32)
    er = _ext(r_p, r_c, r_n, 4 * s).astype(jnp.float32)
    eq = _ext(q_p, q_c, q_n, 4 * s).astype(jnp.float32)
    eg = _ext(g_p, g_c, g_n, 4 * s).astype(jnp.float32)
    ehf = eh.astype(jnp.float32)
    io = eh.dtype
    ext0 = i * T - 4 * s - pad  # data-row index of ext row 0

    # Elementwise chains on the full ext (cheap; every row well-defined
    # because z/r/q/g are saved for all padded rows).
    dq = eg * ez
    dz = eg * (eq - ehf)
    dqh = (dq * (1.0 - eq * eq)).astype(io)               # [E, Ch]
    dzh = (dz * ez * (1.0 - ez)).astype(io)

    # drh on region rows [2s, T+6s): drh[y] = sum_t mask dqh[y-o] Wqh[t]^T
    Tr = T + 4 * s
    reg0 = ext0 + 2 * s
    drh = jnp.zeros((Tr, Ch), jnp.float32)
    for t in range(TAPS):
        o = (t - RAD) * s
        dsl = dqh[2 * s - o:2 * s - o + Tr, :]
        if masked and o != 0:
            dsl = jnp.where(_wmask(Tr, width, -o, reg0), dsl, 0)
        drh = drh + dot_t(dsl, wqh_ref[t])
    ehr = ehf[2 * s:2 * s + Tr, :]
    dr = drh * ehr
    drhat = (dr * er[2 * s:2 * s + Tr, :]
             * (1.0 - er[2 * s:2 * s + Tr, :])).astype(io)  # region rows

    # dh center: direct terms + conv-transpose of dzh/drhat + drh*r.
    cen = slice(4 * s, 4 * s + T)
    cen0 = ext0 + 4 * s
    dh = (eg[cen] * (1.0 - ez[cen])
          + drh[2 * s:2 * s + T, :] * er[cen])
    dx = jnp.zeros((T, dx_ref.shape[-1]), jnp.float32)
    for t in range(TAPS):
        o = (t - RAD) * s
        dslz = dzh[4 * s - o:4 * s - o + T, :]
        dslr = drhat[2 * s - o:2 * s - o + T, :]
        dslq = dqh[4 * s - o:4 * s - o + T, :]
        if masked and o != 0:
            m = _wmask(T, width, -o, cen0)
            dslz = jnp.where(m, dslz, 0)
            dslr = jnp.where(m, dslr, 0)
            dslq = jnp.where(m, dslq, 0)
        dh = dh + dot_t(dslz, wzh_ref[t]) + dot_t(dslr, wrh_ref[t])
        dx = dx + dot_t(dslz, wzx_ref[t]) + dot_t(dslr, wrx_ref[t]) \
            + dot_t(dslq, wqx_ref[t])

    # Weight/bias grads: sum over center rows only (each global row once).
    dzh_c = dzh[cen]
    dqh_c = dqh[cen]
    drhat_c = drhat[2 * s:2 * s + T, :]
    rh = (er[2 * s:2 * s + Tr, :] * ehr).astype(io)
    for t in range(TAPS):
        o = (t - RAD) * s
        sh = eh[4 * s + o:4 * s + o + T, :]
        sx = ex[4 * s + o:4 * s + o + T, :]
        srh = rh[2 * s + o:2 * s + o + T, :]
        if masked and o != 0:
            m = _wmask(T, width, o, cen0)
            sh = jnp.where(m, sh, 0)
            sx = jnp.where(m, sx, 0)
            srh = jnp.where(m, srh, 0)
        dwzh_ref[t] += dot_w(sh, dzh_c).astype(dwzh_ref.dtype)
        dwzx_ref[t] += dot_w(sx, dzh_c).astype(dwzx_ref.dtype)
        dwrh_ref[t] += dot_w(sh, drhat_c).astype(dwrh_ref.dtype)
        dwrx_ref[t] += dot_w(sx, drhat_c).astype(dwrx_ref.dtype)
        dwqh_ref[t] += dot_w(srh, dqh_c).astype(dwqh_ref.dtype)
        dwqx_ref[t] += dot_w(sx, dqh_c).astype(dwqx_ref.dtype)
    db_ref[0:1, :] += jnp.sum(dzh_c.astype(jnp.float32), axis=0,
                              keepdims=True)
    db_ref[1:2, :] += jnp.sum(drhat_c.astype(jnp.float32), axis=0,
                              keepdims=True)
    db_ref[2:3, :] += jnp.sum(dqh_c.astype(jnp.float32), axis=0,
                              keepdims=True)

    dh_ref[0] = dh.astype(dh_ref.dtype)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def fused_gru_vmem_ok(HW: int, Ch: int, Cx: int, stride: int = 1,
                      itemsize: int = 2) -> bool:
    """The tiled s=1 kernels handle any spatial size (the vertical pass runs
    on the transposed image); gate only on the channel/weight budget."""
    del HW, stride
    weights = TAPS * 3 * (Ch * Ch + Cx * Ch) * itemsize
    return weights < 4 * 2 ** 20 and Ch % 8 == 0


def _pad_rows(a, total, pad):
    B, HW, C = a.shape
    return jnp.pad(a, ((0, 0), (pad, total - HW - pad), (0, 0)))


def _nbr_specs(T, C, n):
    """(prev, cur, next) block specs over [B, n*T, C] with edge clamping."""
    def mk(d):
        return pl.BlockSpec(
            (1, T, C),
            lambda b, i, d=d: (b, jnp.clip(i + d, 0, n - 1), 0),
            memory_space=pltpu.VMEM)
    return mk(-1), mk(0), mk(1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def gru_pass(h, x, wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq,
             stride, width, interpret):
    """One directional SepConvGRU pass.

    h: [B, HW, Ch]; x: [B, HW, Cx]; w*h: [5, Ch, Ch]; w*x: [5, Cx, Ch];
    b*: [Ch].  stride: 1 (horizontal 1x5 taps) or W (vertical 5x1 taps);
    width: the image W (for the horizontal row-crossing masks).
    Returns h': [B, HW, Ch].
    """
    out, _ = _gru_fwd(h, x, wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq,
                      stride, width, interpret)
    return out


def _gru_fwd(h, x, wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq,
             stride, width, interpret):
    B, HW, Ch = h.shape
    Cx = x.shape[-1]
    s = stride
    T, n = plan_tiles(HW, s, budget_rows=512)
    pad = 4 * s
    total = n * T
    io = h.dtype
    hp = _pad_rows(h, total, pad)
    xp = _pad_rows(x.astype(io), total, pad)
    ws = [w.astype(io) for w in (wzh, wzx, wrh, wrx, wqh, wqx)]
    bias = jnp.stack([bz, br, bq]).astype(jnp.float32)  # [3, Ch]

    kern = functools.partial(_gru_fwd_kernel, s=s, width=width, T=T,
                             pad=pad, masked=(s == 1))
    hspecs = _nbr_specs(T, Ch, n)
    xspecs = _nbr_specs(T, Cx, n)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
    out_spec = pl.BlockSpec((1, T, Ch), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    hout, z, r, q = pl.pallas_call(
        kern,
        grid=(B, n),
        in_specs=[*hspecs, *xspecs, *wspecs],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, total, Ch), io)] * 4,
        interpret=interpret,
    )(hp, hp, hp, xp, xp, xp, *ws, bias)
    sl = slice(pad, pad + HW)
    # Residuals unpadded: the backward re-pads with its own tile plan.
    return hout[:, sl], (h, x, z[:, sl], r[:, sl], q[:, sl],
                         wzh, wzx, wrh, wrx, wqh, wqx)


def _gru_fwd_vjp(h, x, wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq,
                 stride, width, interpret):
    out, res = _gru_fwd(h, x, wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq,
                        stride, width, interpret)
    return out, res


def _gru_bwd_vjp(stride, width, interpret, res, g):
    h, x, z, r, q, wzh, wzx, wrh, wrx, wqh, wqx = res
    B, HW, Ch = h.shape
    Cx = x.shape[-1]
    s = stride
    T, n = plan_tiles(HW, s, budget_rows=256)
    pad = 4 * s
    total = n * T
    io = h.dtype
    hp = _pad_rows(h, total, pad)
    xp = _pad_rows(x.astype(io), total, pad)
    gp = _pad_rows(g.astype(io), total, pad)
    z = _pad_rows(z, total, pad)
    r = _pad_rows(r, total, pad)
    q = _pad_rows(q, total, pad)
    ws = [w.astype(io) for w in (wzh, wzx, wrh, wrx, wqh, wqx)]

    kern = functools.partial(_gru_bwd_kernel, s=s, width=width, T=T,
                             pad=pad, masked=(s == 1))
    specs = []
    for C in (Ch, Cx, Ch, Ch, Ch, Ch):
        specs.extend(_nbr_specs(T, C, n))
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
    full = lambda b, i: (0, 0, 0)  # noqa: E731 — weight-grad accumulators
    outs = pl.pallas_call(
        kern,
        grid=(B, n),
        in_specs=[*specs, *wspecs],
        out_specs=[
            pl.BlockSpec((1, T, Ch), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Cx), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, Ch, Ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, Cx, Ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, Ch, Ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, Cx, Ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, Ch, Ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, Cx, Ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Ch), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, total, Ch), h.dtype),
            jax.ShapeDtypeStruct((B, total, Cx), x.dtype),
            jax.ShapeDtypeStruct((TAPS, Ch, Ch), jnp.float32),
            jax.ShapeDtypeStruct((TAPS, Cx, Ch), jnp.float32),
            jax.ShapeDtypeStruct((TAPS, Ch, Ch), jnp.float32),
            jax.ShapeDtypeStruct((TAPS, Cx, Ch), jnp.float32),
            jax.ShapeDtypeStruct((TAPS, Ch, Ch), jnp.float32),
            jax.ShapeDtypeStruct((TAPS, Cx, Ch), jnp.float32),
            jax.ShapeDtypeStruct((3, Ch), jnp.float32),
        ],
        interpret=interpret,
    )(hp, hp, hp, xp, xp, xp, z, z, z, r, r, r, q, q, q, gp, gp, gp, *ws)
    dh, dx, dwzh, dwzx, dwrh, dwrx, dwqh, dwqx, db = outs
    sl = slice(pad, pad + HW)
    return (dh[:, sl], dx[:, sl],
            dwzh.astype(wzh.dtype), dwzx.astype(wzx.dtype),
            dwrh.astype(wrh.dtype), dwrx.astype(wrx.dtype),
            dwqh.astype(wqh.dtype), dwqx.astype(wqx.dtype),
            db[0], db[1], db[2])


gru_pass.defvjp(_gru_fwd_vjp, _gru_bwd_vjp)
