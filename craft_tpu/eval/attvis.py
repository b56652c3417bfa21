"""Attention / correlation visualization (reference attvis.py:33-138).

dump_attention() runs the model with the 'intermediates' collection mutable
and saves the captured correlation volume / attention probs to .npz (the
flax-native replacement for the reference's SAVECORR/SAVEF2 env hooks).
vis_attention() renders per-query-point heatmaps — median-subtracted, JET
colormap — overlaid on frame 2, with a query-box annotation.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Sequence, Tuple

import numpy as np


def dump_attention(cfg, variables, image1: np.ndarray, image2: np.ndarray,
                   save_path: str, iters: int = 12) -> Dict[str, np.ndarray]:
    """Run the model capturing intermediates; save corr volume + attn probs."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict
    from craft_tpu.models.flow_model import FlowModel

    model = FlowModel(cfg=cfg, train=False)
    (lowres, flows), inter = model.apply(
        variables, jnp.asarray(image1), jnp.asarray(image2), iters=iters,
        mutable=["intermediates"])
    flat = flatten_dict(inter.get("intermediates", {}))
    dumps = {}
    for path, value in flat.items():
        # sow stores tuples of values; take the first occurrence.
        arr = np.asarray(value[0] if isinstance(value, tuple) else value)
        dumps["/".join(p for p in path if p != "__call__")] = arr
    np.savez_compressed(save_path, **dumps)
    print(f"Attention dumps saved to {save_path}: "
          f"{ {k: v.shape for k, v in dumps.items()} }")
    return dumps


def _jet(x: np.ndarray) -> np.ndarray:
    """Minimal JET colormap on [0,1] -> uint8 RGB (no cv2 dependency)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def vis_attention(attn: np.ndarray, image2: np.ndarray,
                  query_points: Sequence[Tuple[int, int]],
                  out_dir: str, grid_hw: Tuple[int, int],
                  alpha: float = 0.5, prefix: str = "att"):
    """Render attention heatmaps for query points.

    attn: [U, U] (or [M, U, U] — modes averaged) attention over a grid_hw
    1/8-res grid; image2: [H, W, 3] uint8-range; query_points in 1/8-res
    (row, col) cells.
    """
    from PIL import Image

    if attn.ndim == 3:
        attn = attn.mean(0)
    H8, W8 = grid_hw
    H, W = image2.shape[:2]
    os.makedirs(out_dir, exist_ok=True)
    n_saved = 0
    for (qy, qx) in query_points:
        if not (0 <= qy < H8 and 0 <= qx < W8):
            print(f"query point ({qy},{qx}) outside the {H8}x{W8} 1/8-res "
                  "grid; skipped")
            continue
        amap = attn[qy * W8 + qx].reshape(H8, W8)
        # Median-subtract for contrast (reference attvis.py:70-80).
        amap = amap - np.median(amap)
        amap = np.maximum(amap, 0)
        amap = amap / (amap.max() + 1e-8)
        amap_img = np.array(Image.fromarray(
            (amap * 255).astype(np.uint8)).resize((W, H), Image.BILINEAR))
        heat = _jet(amap_img / 255.0).astype(np.float32)
        base = image2.astype(np.float32)
        overlay = (1 - alpha) * base + alpha * heat
        overlay = overlay.astype(np.uint8)
        # Query-box annotation.
        y0, x0 = qy * 8, qx * 8
        overlay[max(0, y0 - 1):y0 + 9, max(0, x0 - 1):x0 + 9] = \
            np.where(np.ones((1, 1, 3), bool), overlay[
                max(0, y0 - 1):y0 + 9, max(0, x0 - 1):x0 + 9], 0)
        overlay[y0:y0 + 8, x0] = [255, 255, 255]
        overlay[y0:y0 + 8, min(x0 + 7, W - 1)] = [255, 255, 255]
        overlay[y0, x0:x0 + 8] = [255, 255, 255]
        overlay[min(y0 + 7, H - 1), x0:x0 + 8] = [255, 255, 255]
        out = osp.join(out_dir, f"{prefix}_{qy}_{qx}.png")
        Image.fromarray(overlay).save(out)
        n_saved += 1
    print(f"Saved {n_saved} attention maps to {out_dir}")
