"""Shared attention-visualization driver for the vis-*.sh scripts
(reference vis-sintel.sh / vis-slowflow.sh / vis-slowflow-shift.sh:
SAVECORR/SAVEF2 env hooks + attvis.py; here flax 'intermediates' + heatmaps).

Supports the reference's --scale (half-res slowflow protocol,
evaluate.py:1126-1130) and the shift-robustness vis (--xshift/--yshift,
evaluate.py:44-89 shift_pixels semantics).
"""

import argparse
import os
import sys

import numpy as np

# Runnable as `python scripts/visdump.py` without an installed package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from craft_tpu.cli import add_model_args, model_config_from_args


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--img1", required=True)
    p.add_argument("--img2", required=True)
    p.add_argument("--out", default="vis_out")
    p.add_argument("--points", default="10,10;20,30",
                   help="semicolon list of 1/8-res query cells row,col")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--xshift", type=int, default=0)
    p.add_argument("--yshift", type=int, default=0)
    add_model_args(p)
    args = p.parse_args()
    args.mixed_precision = True

    from craft_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from craft_tpu.evaluate import load_variables
    from craft_tpu.eval.attvis import dump_attention, vis_attention
    from craft_tpu.data import frame_utils
    from craft_tpu.ops.geometry import shift_pixels

    cfg = model_config_from_args(args)
    variables = load_variables(args, cfg)
    img1 = np.asarray(frame_utils.read_gen(args.img1), np.float32)[..., :3]
    img2 = np.asarray(frame_utils.read_gen(args.img2), np.float32)[..., :3]
    if args.scale != 1.0:
        import cv2
        img1 = cv2.resize(img1, None, fx=args.scale, fy=args.scale,
                          interpolation=cv2.INTER_LINEAR)
        img2 = cv2.resize(img2, None, fx=args.scale, fy=args.scale,
                          interpolation=cv2.INTER_LINEAR)
    if args.xshift or args.yshift:
        dummy_flow = np.zeros(img1.shape[:2] + (2,), np.float32)
        img1, _, _ = shift_pixels(img1, dummy_flow, None,
                                  args.xshift, args.yshift)
    # Crop to mod 8 so the 1/8 grid is exact for the query-cell mapping.
    H = img1.shape[0] - img1.shape[0] % 8
    W = img1.shape[1] - img1.shape[1] % 8
    img1, img2 = img1[None, :H, :W], img2[None, :H, :W]
    H8, W8 = H // 8, W // 8
    os.makedirs(args.out, exist_ok=True)
    dumps = dump_attention(cfg, variables, img1, img2,
                           args.out + "/dumps.npz", iters=args.iters)
    pts = [tuple(int(v) for v in pt.split(",")) for pt in args.points.split(";")]
    for key, arr in dumps.items():
        if arr.ndim >= 3:
            vis_attention(arr[0], img2[0].astype(np.uint8), pts,
                          args.out, (H8, W8), prefix=key.replace("/", "_"))


if __name__ == "__main__":
    main()
