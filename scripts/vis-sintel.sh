#!/usr/bin/env bash
# Attention/correlation visualization pipeline (reference vis-sintel.sh:
# SAVECORR/SAVEF2 env hooks + attvis.py).  Our framework captures the tensors
# via flax 'intermediates' and renders heatmaps directly:
set -e
python3 - "$@" <<'PY'
import sys
import numpy as np

from craft_tpu.cli import add_model_args, model_config_from_args
import argparse

p = argparse.ArgumentParser()
p.add_argument("--model", required=True)
p.add_argument("--img1", required=True)
p.add_argument("--img2", required=True)
p.add_argument("--out", default="vis_out")
p.add_argument("--points", default="10,10;20,30",
               help="semicolon list of 1/8-res query cells row,col")
add_model_args(p)
args = p.parse_args()
args.mixed_precision = True

from craft_tpu.utils.jax_setup import setup_jax
setup_jax()
from craft_tpu.evaluate import load_variables
from craft_tpu.eval.attvis import dump_attention, vis_attention
from craft_tpu.data import frame_utils

cfg = model_config_from_args(args)
variables = load_variables(args, cfg)
img1 = np.asarray(frame_utils.read_gen(args.img1), np.float32)[None, ..., :3]
img2 = np.asarray(frame_utils.read_gen(args.img2), np.float32)[None, ..., :3]
H8, W8 = img1.shape[1] // 8, img1.shape[2] // 8
dumps = dump_attention(cfg, variables, img1, img2, args.out + "/dumps.npz",
                       iters=args.iters)
pts = [tuple(int(v) for v in pt.split(",")) for pt in args.points.split(";")]
for key, arr in dumps.items():
    if arr.ndim >= 3:
        vis_attention(arr[0], img2[0].astype(np.uint8), pts,
                      args.out, (H8, W8), prefix=key.replace("/", "_"))
PY
