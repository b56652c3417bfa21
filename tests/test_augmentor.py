"""Augmentation pipeline tests: output contracts, flip/scale flow math,
sparse re-scatter correctness, shift-consistency mask."""

import numpy as np
import pytest


def _pair(rng, H=120, W=160):
    img1 = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    img2 = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    flow = rng.uniform(-5, 5, (H, W, 2)).astype(np.float32)
    return img1, img2, flow


def test_flow_augmentor_contract(rng):
    from craft_tpu.data.augmentor import FlowAugmentor

    np.random.seed(0)
    aug = FlowAugmentor("test", crop_size=(64, 96), min_scale=-0.2,
                        max_scale=0.5)
    img1, img2, flow = _pair(rng)
    for _ in range(5):
        o1, o2, of, valid = aug(img1.copy(), img2.copy(), flow.copy())
        assert o1.shape == (64, 96, 3) and o2.shape == (64, 96, 3)
        assert of.shape == (64, 96, 2)
        assert o1.dtype == np.uint8
        assert valid is None  # no shift aug


def test_hflip_flow_sign():
    from craft_tpu.data.augmentor import FlowAugmentor

    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 3.0
    flipped = flow[:, ::-1] * [-1.0, 1.0]
    assert np.all(flipped[..., 0] == -3.0)
    assert np.all(flipped[..., 1] == 0.0)


def test_sparse_resize_rescatters(rng):
    from craft_tpu.data.augmentor import SparseFlowAugmentor

    H, W = 20, 30
    flow = np.zeros((H, W, 2), np.float32)
    valid = np.zeros((H, W), np.float32)
    flow[5, 7] = (2.0, -1.0)
    valid[5, 7] = 1.0
    fx = fy = 2.0
    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(flow, valid, fx, fy)
    assert f2.shape == (40, 60, 2) and v2.shape == (40, 60)
    # The single valid vector lands at the rounded scaled cell, scaled.
    ys, xs = np.nonzero(v2)
    assert list(zip(ys, xs)) == [(10, 14)]
    np.testing.assert_allclose(f2[10, 14], [4.0, -2.0])
    assert v2.sum() == 1


def test_random_shift_consistency(rng):
    from craft_tpu.data.augmentor import random_shift

    np.random.seed(3)
    import random as _r
    _r.seed(3)
    H, W = 64, 80
    img1 = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    img2 = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    flow = rng.uniform(-2, 2, (H, W, 2)).astype(np.float32)
    i1, i2, f, valid = random_shift(img1, img2, flow, shift_sigmas=(16, 10))
    assert i1.shape == i2.shape
    assert i1.shape[:2] == f.shape[:2] == valid.shape
    # valid area is a strict subset unless the shift was 0.
    assert valid.dtype == bool
    assert valid.sum() <= i1.shape[0] * i1.shape[1]


def test_color_jitter_preserves_shape_dtype(rng):
    from craft_tpu.data.augmentor import ColorJitter
    from PIL import Image

    cj = ColorJitter(0.4, 0.4, 0.4, 0.15)
    img = rng.randint(0, 255, (32, 48, 3), dtype=np.uint8)
    out = np.array(cj(Image.fromarray(img)))
    assert out.shape == img.shape
    assert out.dtype == np.uint8
