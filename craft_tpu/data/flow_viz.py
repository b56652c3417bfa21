"""Optical-flow visualization: Baker color wheel (reference
core/utils/flow_viz.py:21-143; original: Tom Runia / Daniel Scharstein /
Deqing Sun).  Vectorized numpy, no per-channel Python loop.
"""

from __future__ import annotations

import numpy as np


def make_colorwheel() -> np.ndarray:
    """55-color wheel across RY/YG/GC/CB/BM/MR sectors."""
    sectors = [("RY", 15), ("YG", 6), ("GC", 4), ("CB", 11), ("BM", 13), ("MR", 6)]
    ncols = sum(n for _, n in sectors)
    wheel = np.zeros((ncols, 3))
    col = 0
    for name, n in sectors:
        ramp = np.floor(255 * np.arange(n) / n)
        if name == "RY":
            wheel[col:col + n, 0] = 255
            wheel[col:col + n, 1] = ramp
        elif name == "YG":
            wheel[col:col + n, 0] = 255 - ramp
            wheel[col:col + n, 1] = 255
        elif name == "GC":
            wheel[col:col + n, 1] = 255
            wheel[col:col + n, 2] = ramp
        elif name == "CB":
            wheel[col:col + n, 1] = 255 - ramp
            wheel[col:col + n, 2] = 255
        elif name == "BM":
            wheel[col:col + n, 2] = 255
            wheel[col:col + n, 0] = ramp
        elif name == "MR":
            wheel[col:col + n, 2] = 255 - ramp
            wheel[col:col + n, 0] = 255
        col += n
    return wheel


def flow_uv_to_colors(u: np.ndarray, v: np.ndarray,
                      convert_to_bgr: bool = False) -> np.ndarray:
    wheel = make_colorwheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = np.where(k0 + 1 == ncols, 0, k0 + 1)
    f = (fk - k0)[..., None]

    col = (1 - f) * wheel[k0] / 255.0 + f * wheel[k1] / 255.0  # [H, W, 3]
    in_range = (rad <= 1)[..., None]
    col = np.where(in_range, 1 - rad[..., None] * (1 - col), col * 0.75)
    img = np.floor(255 * col).astype(np.uint8)
    if convert_to_bgr:
        img = img[..., ::-1]
    return img


def flow_to_image(flow_uv: np.ndarray, clip_flow=None,
                  convert_to_bgr: bool = False) -> np.ndarray:
    assert flow_uv.ndim == 3 and flow_uv.shape[2] == 2
    if clip_flow is not None:
        flow_uv = np.clip(flow_uv, 0, clip_flow)
    u, v = flow_uv[..., 0], flow_uv[..., 1]
    rad_max = np.sqrt(u ** 2 + v ** 2).max()
    scale = rad_max + 1e-5
    return flow_uv_to_colors(u / scale, v / scale, convert_to_bgr)


def warp_flow(image2: np.ndarray, flowgt: np.ndarray) -> np.ndarray:
    """Backward-warp image2 by GT flow (reference flow_viz.py:135-143)."""
    import cv2
    H, W, _ = image2.shape
    flow2 = flowgt.copy()
    flow2[:, :, 0] += np.arange(W)
    flow2[:, :, 1] += np.arange(H)[:, None]
    return cv2.remap(image2, flow2, None, cv2.INTER_LINEAR)
