"""Core geometric numerics: sampling, grids, flow up/down-scaling, padding.

TPU-native replacements for the reference's torch numerics
(reference: core/utils/utils.py:14-139, core/network.py:142-162).  All image-like
arrays are NHWC; flow/coords arrays carry their 2-vector in the trailing axis with
(x, y) channel order, matching the reference convention (utils.py:82-85).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B, H, W, 2] pixel-coordinate grid, channels (x, y).

    Parity with reference coords_grid (utils.py:82-85), transposed to NHWC.
    """
    ys, xs = jnp.meshgrid(jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype),
                          indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)  # [H, W, 2], (x, y)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling at pixel coordinates with zero padding outside.

    Matches ``F.grid_sample(..., align_corners=True, padding_mode='zeros')`` applied
    to pixel coords as the reference's bilinear_sampler does (utils.py:65-79): with
    align_corners=True the un-normalization is the identity on pixel coordinates, so
    we sample directly and zero out-of-bounds taps.

    Args:
      img: [B, H, W, C].
      coords: [B, h, w, 2] with (x, y) pixel coordinates.
    Returns:
      [B, h, w, C] sampled values, float32.
    """
    H, W = img.shape[1], img.shape[2]
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def tap(yi, xi, wy, wx):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        # Gather per batch element: img[b, yi[b,...], xi[b,...], :]
        v = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yi_c, xi_c)
        w = (wy * wx) * valid.astype(jnp.float32)
        return v * w[..., None]

    out = (tap(y0, x0, wy0, wx0) + tap(y0, x1, wy0, wx1)
           + tap(y1, x0, wy1, wx0) + tap(y1, x1, wy1, wx1))
    return out


def bilinear_sample_with_mask(img: jnp.ndarray, coords: jnp.ndarray):
    """Like bilinear_sample but also returns the strict in-bounds mask
    (reference utils.py:75-77: grid strictly inside (-1, 1))."""
    H, W = img.shape[1], img.shape[2]
    x = coords[..., 0]
    y = coords[..., 1]
    mask = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
    return bilinear_sample(img, coords), mask.astype(jnp.float32)


def _interpolate_bilinear_ac(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) on NHWC input."""
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw
    ys = jnp.linspace(0.0, H - 1.0, oh) if oh > 1 else jnp.zeros((oh,))
    xs = jnp.linspace(0.0, W - 1.0, ow) if ow > 1 else jnp.zeros((ow,))
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx, gy], axis=-1)[None]  # [1, oh, ow, 2]
    coords = jnp.broadcast_to(coords, (x.shape[0], oh, ow, 2))
    return bilinear_sample(x, coords)


def upflow(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Bilinear-upsample a [B,H,W,2] flow by `factor`, scaling the vectors too
    (reference upflow8/4/2, utils.py:117-129)."""
    H, W = flow.shape[1], flow.shape[2]
    return factor * _interpolate_bilinear_ac(flow, (factor * H, factor * W))


def downflow(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Bilinear-downsample a [B,H,W,2] flow by `factor` (reference downflow8/4)."""
    H, W = flow.shape[1], flow.shape[2]
    return _interpolate_bilinear_ac(flow, (H // factor, W // factor)) / factor


def _convex_parts(flow: jnp.ndarray, mask: jnp.ndarray, factor: int):
    """Shared convex-combination core: per-component upsampled sub-pixel
    blocks ux, uy [B, H, W, factor*factor] (row-major (fr, fc) channel
    order)."""
    B, H, W, _ = flow.shape
    f2 = factor * factor
    # TPU layout note: everything below is elementwise on [B, H, W, f2]
    # lane-aligned slices — no middle-axis softmax, no [.., 9, ..] einsum
    # (those forced several full-tensor relayouts; measured 31 -> ~6 ms
    # for 12 fwd+bwd applications at the chairs train config).
    parts = [mask[..., k * f2:(k + 1) * f2] for k in range(9)]
    mmax = parts[0]
    for p in parts[1:]:
        mmax = jnp.maximum(mmax, p)
    exps = [jnp.exp(p - mmax) for p in parts]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e

    fp = jnp.pad(factor * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 9 neighbours in the same order as F.unfold with a 3x3 kernel: row-major
    # window offsets (-1,-1), (-1,0), ..., (1,1).
    accx = accy = 0.0
    for k, e in enumerate(exps):
        di, dj = divmod(k, 3)
        n = fp[:, di:di + H, dj:dj + W, :]  # [B, H, W, 2]
        accx = accx + e * n[..., 0:1]
        accy = accy + e * n[..., 1:2]
    return accx / denom, accy / denom


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Convex 9-neighbour upsampling (reference network.py:151-162).

    Args:
      flow: [B, H, W, 2] 1/8-resolution flow.
      mask: [B, H, W, 9*factor*factor] logits, channel layout (9, factor, factor)
            row-major to match the torch ``view(N, 1, 9, 8, 8, H, W)`` split of the
            576-channel conv output.
    Returns:
      [B, factor*H, factor*W, 2].
    """
    B, H, W, _ = flow.shape
    ux, uy = _convex_parts(flow, mask, factor)
    up = jnp.stack([ux, uy], axis=-1)
    up = up.reshape(B, H, W, factor, factor, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [B, H, fr, W, fc, 2]
    return up.reshape(B, factor * H, factor * W, 2)


def convex_upsample_packed(flow: jnp.ndarray, mask: jnp.ndarray,
                           factor: int = 8) -> jnp.ndarray:
    """convex_upsample without the pixel shuffle: [B, H, W, 2*factor^2] with
    the x sub-pixel block (row-major (fr, fc)) in channels [:f2] and y in
    [f2:].  Values are bitwise those of convex_upsample, just laid out
    lane-aligned — the 6-D shuffle with a minor dim of 2 forced several
    tile-padded relayout copies per refinement iteration on TPU (~64x lane
    waste on (8, 128) tiles).  Use unpack_upsampled / pack helpers to cross
    between layouts; the training loss consumes this form directly."""
    ux, uy = _convex_parts(flow, mask, factor)
    return jnp.concatenate([ux, uy], axis=-1)


def unpack_upsampled(packed: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """[B, H, W, 2*factor^2] packed flow -> [B, factor*H, factor*W, 2]."""
    B, H, W, c2 = packed.shape
    f2 = c2 // 2
    assert f2 == factor * factor
    up = jnp.stack([packed[..., :f2], packed[..., f2:]], axis=-1)
    up = up.reshape(B, H, W, factor, factor, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, factor * H, factor * W, 2)


def pack_fullres(x: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Inverse of unpack_upsampled for ground truth: [B, fH, fW, C] ->
    [B, H, W, C*factor^2] with each channel's (fr, fc) block contiguous
    (channel-major: all of channel 0's f2 slots, then channel 1's)."""
    B, FH, FW, C = x.shape
    H, W = FH // factor, FW // factor
    x = x.reshape(B, H, factor, W, factor, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H, W, C, fr, fc]
    return x.reshape(B, H, W, C * factor * factor)


def avg_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool, VALID padding — parity with torch
    ``F.avg_pool2d(x, 2, stride=2)`` on odd sizes (floor semantics).  NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


class InputPadder:
    """Pads NHWC images so H, W are divisible by `mod` (reference utils.py:14-31).

    mode='sintel' pads symmetrically (centre); otherwise pads bottom only.
    Replicate-edge padding, matching ``F.pad(mode='replicate')``.
    """

    def __init__(self, dims: Sequence[int], mode: str = "sintel", mod: int = 8):
        self.ht, self.wd = dims[-3], dims[-2]  # NHWC
        pad_ht = (((self.ht // mod) + 1) * mod - self.ht) % mod
        pad_wd = (((self.wd // mod) + 1) * mod - self.wd) % mod
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        l, r, t, b = self._pad
        return [jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
                for x in inputs]

    def unpad(self, x):
        ht, wd = x.shape[1], x.shape[2]
        l, r, t, b = self._pad
        return x[:, t:ht - b, l:wd - r, :]


def shift_pixels(img1: np.ndarray, flow: np.ndarray, valid: np.ndarray,
                 dx: int, dy: int):
    """Shift-robustness protocol: translate image1 and GT flow by (dx, dy), masking
    the vacated border invalid (reference evaluate.py:44-89).  Host-side numpy.

    img1: [H, W, 3]; flow: [H, W, 2]; valid: [H, W] or None (dense GT -> all valid).
    Positive dx shifts content right; positive dy shifts content down.
    """
    H, W = img1.shape[:2]
    if valid is None:
        valid = np.ones((H, W), dtype=np.float32)
    out_img = np.zeros_like(img1)
    out_flow = np.zeros_like(flow)
    out_valid = np.zeros_like(valid)

    sy0, sy1 = max(0, dy), min(H, H + dy)
    sx0, sx1 = max(0, dx), min(W, W + dx)
    ty0, ty1 = max(0, -dy), min(H, H - dy)
    tx0, tx1 = max(0, -dx), min(W, W - dx)
    # Content at source [ty0:ty1, tx0:tx1] lands at target [sy0:sy1, sx0:sx1].
    out_img[sy0:sy1, sx0:sx1] = img1[ty0:ty1, tx0:tx1]
    out_flow[sy0:sy1, sx0:sx1] = flow[ty0:ty1, tx0:tx1]
    out_flow[sy0:sy1, sx0:sx1, 0] -= dx
    out_flow[sy0:sy1, sx0:sx1, 1] -= dy
    out_valid[sy0:sy1, sx0:sx1] = valid[ty0:ty1, tx0:tx1]
    return out_img, out_flow, out_valid


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """Forward-splat a [H, W, 2] flow to the next frame via nearest-neighbour
    scatter (reference utils.py:34-62, used for Sintel warm start).  Host numpy.
    """
    from scipy import interpolate as scipy_interpolate

    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    x1, y1, dxf, dyf = x1[valid], y1[valid], dxf[valid], dyf[valid]
    flow_x = scipy_interpolate.griddata((x1, y1), dxf, (x0, y0),
                                        method="nearest", fill_value=0)
    flow_y = scipy_interpolate.griddata((x1, y1), dyf, (x0, y0),
                                        method="nearest", fill_value=0)
    return np.stack([flow_x, flow_y], axis=-1).astype(np.float32)
