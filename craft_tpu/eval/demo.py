"""Single-pair flow demo (reference gen_flow, evaluate.py:1251-1384).

Reads two images, runs the model, writes a flow visualization PNG; optional GT
comparison with EPE, radius-clipped visualization, shift protocol, and
optional down-scaling; optional compiled-FLOPs report (fvcore analog via
XLA cost analysis).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
from PIL import Image

from craft_tpu.config import ModelConfig
from craft_tpu.data import flow_viz, frame_utils
from craft_tpu.eval.evaluate import Evaluator
from craft_tpu.ops.geometry import InputPadder, shift_pixels


def count_model_flops(cfg: ModelConfig, variables, image_shape=(440, 1024),
                      iters: int = 12) -> float:
    """Forward-pass FLOPs from XLA's compiled cost analysis (reference uses
    fvcore FlopCountAnalysis, evaluate.py:28,1336-1339; flop.py)."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.models.flow_model import FlowModel

    model = FlowModel(cfg=cfg, train=False)
    H, W = image_shape
    img = jnp.zeros((1, H, W, 3), jnp.float32)

    def fwd(v, a, b):
        return model.apply(v, a, b, iters=iters)[1][-1]

    lowered = jax.jit(fwd).lower(variables, img, img)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


def gen_flow(cfg: ModelConfig, variables, image1_path: str, image2_path: str,
             flow_path=None, output_path="output", iters: int = 12,
             model_name="craft", scale: float = 1.0, xy_shift=None,
             calc_flop: bool = False):
    os.makedirs(output_path, exist_ok=True)
    img1 = np.array(frame_utils.read_gen(image1_path)).astype(np.uint8)[..., :3]
    img2 = np.array(frame_utils.read_gen(image2_path)).astype(np.uint8)[..., :3]
    if img1.ndim == 2:
        img1 = np.tile(img1[..., None], (1, 1, 3))
        img2 = np.tile(img2[..., None], (1, 1, 3))
    img1 = img1.astype(np.float32)
    img2 = img2.astype(np.float32)

    flow_gt = None
    if flow_path:
        flow_gt = np.asarray(frame_utils.read_gen(flow_path), np.float32)

    if scale < 1:
        import cv2
        img1 = cv2.resize(img1, None, fx=scale, fy=scale,
                          interpolation=cv2.INTER_LINEAR)
        img2 = cv2.resize(img2, None, fx=scale, fy=scale,
                          interpolation=cv2.INTER_LINEAR)
        if flow_gt is not None:
            flow_gt = cv2.resize(flow_gt, None, fx=scale, fy=scale,
                                 interpolation=cv2.INTER_LINEAR) * scale

    val_mask = np.ones(img1.shape[:2], bool)
    offset = np.zeros(2, np.float32)
    if xy_shift is not None and tuple(xy_shift) != (0, 0):
        img1, flow_gt, val_mask = shift_pixels(
            img1, flow_gt if flow_gt is not None else
            np.zeros(img1.shape[:2] + (2,), np.float32), None, *xy_shift)
        val_mask = val_mask.astype(bool)
        offset = np.array(xy_shift, np.float32)

    if calc_flop:
        from craft_tpu.eval.flops import print_breakdown
        print_breakdown(cfg, img1.shape[0], img1.shape[1], iters)
        flops = count_model_flops(cfg, variables, img1.shape[:2], iters)
        print(f"Compiled forward FLOPs (XLA cost analysis): "
              f"{flops / 1e9:.1f} G")
        return flops

    padder = InputPadder((1,) + img1.shape, mode="sintel")
    p1, p2 = padder.pad(np.asarray(img1)[None], np.asarray(img2)[None])
    evaluator = Evaluator(cfg, variables, iters=iters)
    _, flows = evaluator(np.asarray(p1), np.asarray(p2))
    flow = np.asarray(padder.unpad(flows[-1]))[0] + offset
    flow[~val_mask] = 0

    name = osp.splitext(osp.basename(image1_path))[0]
    if flow_gt is not None:
        epe = np.sqrt(((flow - flow_gt) ** 2).sum(-1))[val_mask].mean()
        print(f"EPE: {epe:.4f}")
        # Radius-clipped visualization (evaluate.py:1357-1377): clip predicted
        # radii that exceed the GT max, unless too many pixels do.
        gt_rad = np.sqrt((flow_gt ** 2).sum(-1))
        flow_rad = np.sqrt((flow ** 2).sum(-1))
        gt_max = gt_rad.max()
        exceed = flow_rad > gt_max
        ratio = exceed.sum() / max(val_mask.sum(), 1)
        if 0 < ratio <= 0.1:
            scales = np.ones_like(flow_rad)
            scales[exceed] = gt_max / flow_rad[exceed]
            flow = flow * scales[..., None]

    out = osp.join(output_path, f"{name}-{model_name}-{iters}.png")
    Image.fromarray(flow_viz.flow_to_image(flow)).save(out)
    print(f"Generated flow {out}.")
    return flow
