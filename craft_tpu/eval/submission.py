"""Leaderboard submission writers (reference evaluate.py:106-245).

Sintel: 32 iters with optional warm start (forward-interpolated previous
low-res flow as flow_init between consecutive frames of a scene); KITTI: 24
iters, 16-bit PNG codec; VIPER: half-res inference with flow rescaling, 24
iters.  Optional flow visualizations via the Baker color wheel.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np
from PIL import Image

from craft_tpu.config import ModelConfig
from craft_tpu.data import datasets as ds
from craft_tpu.data import frame_utils, flow_viz
from craft_tpu.eval.evaluate import Evaluator
from craft_tpu.ops.geometry import InputPadder, forward_interpolate


class _InitEvaluator(Evaluator):
    """Evaluator variant whose forward accepts a flow_init (Sintel warm start)."""

    def __init__(self, cfg, variables, iters):
        import jax
        import functools
        from craft_tpu.models.flow_model import FlowModel

        self.cfg = cfg
        self.variables = variables
        self.iters = iters
        self.test_mode = 1
        model = FlowModel(cfg=cfg, train=False)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def _forward(variables, image1, image2, flow_init, iters):
            lowres, flows = model.apply(variables, image1, image2, iters=iters,
                                        flow_init=flow_init)
            # Final field only (warm-start submissions); in-jit slice rather
            # than upsample_mode='final' — see Evaluator._forward.
            return lowres, flows[-1:]

        self._forward_init = _forward

    def run(self, image1, image2, flow_init=None):
        import jax.numpy as jnp
        B, H, W, _ = image1.shape
        if flow_init is None:
            flow_init = np.zeros((B, H // 8, W // 8, 2), np.float32)
        lowres, flows = self._forward_init(
            self.variables, jnp.asarray(image1), jnp.asarray(image2),
            jnp.asarray(flow_init), iters=self.iters)
        return np.asarray(lowres), np.asarray(flows[-1])


def create_sintel_submission(cfg: ModelConfig, variables, model_name="craft",
                             data_root="datasets", warm_start=False,
                             output_path="sintel_submission", iters=32,
                             do_vis=False, split="test"):
    evaluator = _InitEvaluator(cfg, variables, iters)
    for dstype in ["clean", "final"]:
        dataset = ds.MpiSintel(split=split, dstype=dstype,
                               root=f"{data_root}/Sintel")
        dataset.is_test = True
        flow_prev, scene_prev = None, None
        for i in range(len(dataset)):
            item = dataset[i]
            scene, frame_id = item["extra_info"]
            if scene != scene_prev:
                flow_prev = None
            img1, img2 = item["image1"], item["image2"]
            padder = InputPadder((1,) + img1.shape, mode="sintel")
            p1, p2 = padder.pad(np.asarray(img1)[None], np.asarray(img2)[None])
            lowres, flow_up = evaluator.run(np.asarray(p1), np.asarray(p2),
                                            flow_prev)
            flow = np.asarray(padder.unpad(flow_up))[0]

            if warm_start:
                flow_prev = forward_interpolate(lowres[0])[None]

            out_dir = osp.join(output_path, dstype, scene)
            os.makedirs(out_dir, exist_ok=True)
            frame_utils.write_flo(osp.join(out_dir,
                                           "frame%04d.flo" % (frame_id + 1)),
                                  flow)
            if do_vis:
                vis_dir = f"vis_sintel/{split}/{model_name}/{dstype}/{scene}"
                os.makedirs(vis_dir, exist_ok=True)
                Image.fromarray(flow_viz.flow_to_image(flow)).save(
                    osp.join(vis_dir, f"frame_{frame_id + 1:04d}.png"))
            scene_prev = scene
    print("Created sintel submission.")


def create_kitti_submission(cfg: ModelConfig, variables, model_name="craft",
                            data_root="datasets",
                            output_path="kitti_submission", iters=24,
                            do_vis=False):
    evaluator = _InitEvaluator(cfg, variables, iters)
    dataset = ds.KITTI(split="testing", root=f"{data_root}/KITTI")
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(dataset)):
        item = dataset[i]
        (frame_id,) = item["extra_info"]
        img1, img2 = item["image1"], item["image2"]
        padder = InputPadder((1,) + img1.shape, mode="kitti")
        p1, p2 = padder.pad(np.asarray(img1)[None], np.asarray(img2)[None])
        _, flow_up = evaluator.run(np.asarray(p1), np.asarray(p2))
        flow = np.asarray(padder.unpad(flow_up))[0]
        frame_utils.write_flow_kitti(osp.join(output_path, frame_id), flow)
        if do_vis:
            os.makedirs(f"vis_kitti/{model_name}", exist_ok=True)
            Image.fromarray(flow_viz.flow_to_image(flow)).save(
                f"vis_kitti/{model_name}/{frame_id}")
    print("Created KITTI submission.")


def create_viper_submission(cfg: ModelConfig, variables, model_name="craft",
                            data_root="datasets",
                            output_path="viper_submission", iters=24,
                            do_vis=False):
    import cv2

    evaluator = _InitEvaluator(cfg, variables, iters)
    dataset = ds.VIPER(split="test", root=f"{data_root}/viper/")
    os.makedirs(output_path, exist_ok=True)
    scale = 0.5
    for i in range(len(dataset)):
        item = dataset[i]
        (frame_id,) = item["extra_info"]
        img1 = cv2.resize(item["image1"], None, fx=scale, fy=scale,
                          interpolation=cv2.INTER_LINEAR)
        img2 = cv2.resize(item["image2"], None, fx=scale, fy=scale,
                          interpolation=cv2.INTER_LINEAR)
        padder = InputPadder((1,) + img1.shape, mode="kitti")
        p1, p2 = padder.pad(np.asarray(img1)[None], np.asarray(img2)[None])
        _, flow_up = evaluator.run(np.asarray(p1), np.asarray(p2))
        flow = np.asarray(padder.unpad(flow_up))[0]
        flow = cv2.resize(flow, None, fx=1 / scale, fy=1 / scale,
                          interpolation=cv2.INTER_LINEAR) / scale
        frame_utils.write_flo(osp.join(output_path, frame_id + ".flo"), flow)
        if do_vis:
            os.makedirs(f"vis_viper/{model_name}", exist_ok=True)
            Image.fromarray(flow_viz.flow_to_image(flow)).save(
                f"vis_viper/{model_name}/{frame_id}.png")
    print("Created VIPER submission.")
