"""Unit tests for core numerics vs torch golden implementations
(SURVEY.md §4: kernel-vs-reference tests for bilinear sampler, corr volume,
pos-bias window, convex upsample, loss)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_bilinear_sample_matches_grid_sample(rng):
    import torch.nn.functional as F
    import jax.numpy as jnp
    from craft_tpu.ops.geometry import bilinear_sample

    B, H, W, C = 3, 9, 13, 2
    img = rng.randn(B, H, W, C).astype(np.float32)
    coords = rng.uniform(-2, max(H, W) + 1, (B, 5, 7, 2)).astype(np.float32)

    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))

    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    x = 2 * torch.from_numpy(coords[..., 0]) / (W - 1) - 1
    y = 2 * torch.from_numpy(coords[..., 1]) / (H - 1) - 1
    grid = torch.stack([x, y], dim=-1)
    want = F.grid_sample(timg, grid, align_corners=True, mode="bilinear",
                         padding_mode="zeros")
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convex_upsample_matches_torch(rng):
    import torch.nn.functional as F
    import jax.numpy as jnp
    from craft_tpu.ops.geometry import convex_upsample

    B, H, W = 2, 5, 6
    flow = rng.randn(B, H, W, 2).astype(np.float32)
    mask = rng.randn(B, H, W, 9 * 64).astype(np.float32)

    got = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))

    tflow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    tmask = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    m = tmask.view(B, 1, 9, 8, 8, H, W)
    m = torch.softmax(m, dim=2)
    up = F.unfold(8 * tflow, [3, 3], padding=1)
    up = up.view(B, 2, 9, 1, 1, H, W)
    up = torch.sum(m * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(B, 2, 8 * H, 8 * W)
    want = up.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upflow_matches_interpolate(rng):
    import torch.nn.functional as F
    import jax.numpy as jnp
    from craft_tpu.ops.geometry import upflow

    flow = rng.randn(1, 6, 8, 2).astype(np.float32)
    got = np.asarray(upflow(jnp.asarray(flow), 8))
    t = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    want = 8 * F.interpolate(t, size=(48, 64), mode="bilinear",
                             align_corners=True)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_avg_pool_floor_semantics(rng):
    import torch.nn.functional as F
    import jax.numpy as jnp
    from craft_tpu.ops.geometry import avg_pool2x2

    x = rng.randn(2, 7, 9, 3).astype(np.float32)  # odd dims
    got = np.asarray(avg_pool2x2(jnp.asarray(x)))
    want = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)
    assert got.shape == (2, 3, 4, 3)


def test_sliding_pos_biases_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference/core")
    import jax.numpy as jnp
    from setrans import SlidingPosBiases2D as TorchBias
    from craft_tpu.nn.setrans import sliding_pos_biases

    torch.manual_seed(0)
    H, W, R = 6, 7, 2
    mod = TorchBias(pos_dim=2, pos_bias_radius=R, max_pos_size=(20, 20))
    with torch.no_grad():
        mod.biases.copy_(torch.randn(2 * R + 1, 2 * R + 1))
    want = mod(torch.zeros(1, 1, H, W).shape, "cpu").reshape(H * W, H * W)
    got = np.asarray(sliding_pos_biases(
        jnp.asarray(mod.biases.detach().numpy()), H, W))
    np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-6)


def test_sequence_loss_matches_reference(rng):
    import jax.numpy as jnp
    from craft_tpu.training.loss import sequence_loss

    iters, B, H, W = 4, 2, 16, 24
    preds = rng.randn(iters, B, H, W, 2).astype(np.float32) * 5
    gt = rng.randn(B, H, W, 2).astype(np.float32) * 5
    valid = (rng.rand(B, H, W) > 0.3).astype(np.float32)
    gamma = 0.8

    loss, metrics = sequence_loss(jnp.asarray(preds), jnp.asarray(gt),
                                  jnp.asarray(valid), gamma)

    # torch-style reference computation (train.py:44-73).
    tp = [torch.from_numpy(preds[i].transpose(0, 3, 1, 2))
          for i in range(iters)]
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    tv = torch.from_numpy(valid)
    tv2 = (tv >= 0.5) & ((tg ** 2).sum(dim=1).sqrt() < 400)
    want = 0.0
    for i in range(iters):
        w = gamma ** (iters - i - 1)
        want = want + w * (tv2[:, None] * (tp[i] - tg).abs()).mean()
    epe = torch.sum((tp[-1] - tg) ** 2, dim=1).sqrt()
    epe = epe.view(-1)[tv2.view(-1)]
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["epe"]), float(epe.mean()),
                               rtol=1e-5)


def test_input_padder_modes(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.geometry import InputPadder

    x = jnp.asarray(rng.randn(1, 436, 1024, 3).astype(np.float32))
    p = InputPadder(x.shape, mode="sintel")
    (xp,) = p.pad(x)
    assert xp.shape == (1, 440, 1024, 3)
    assert np.allclose(np.asarray(p.unpad(xp)), np.asarray(x))

    x = jnp.asarray(rng.randn(1, 375, 1242, 3).astype(np.float32))
    p = InputPadder(x.shape, mode="kitti")
    (xp,) = p.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    # kitti mode pads bottom only (top row unchanged).
    assert np.allclose(np.asarray(xp[:, 0, 3:-3]), np.asarray(x[:, 0, :]))
    assert np.allclose(np.asarray(p.unpad(xp)), np.asarray(x))


def test_flow_io_roundtrip(tmp_path, rng):
    from craft_tpu.data import frame_utils

    flow = rng.randn(17, 23, 2).astype(np.float32)
    p = str(tmp_path / "t.flo")
    frame_utils.write_flo(p, flow)
    got = frame_utils.read_flo(p)
    np.testing.assert_allclose(got, flow, atol=0)

    p2 = str(tmp_path / "t.png")
    flow_small = np.clip(flow, -100, 100)
    frame_utils.write_flow_kitti(p2, flow_small)
    got2, valid = frame_utils.read_flow_kitti(p2)
    np.testing.assert_allclose(got2, flow_small, atol=1 / 64 + 1e-6)
    assert valid.min() == 1


def test_forward_interpolate_shapes(rng):
    from craft_tpu.ops.geometry import forward_interpolate

    flow = rng.randn(12, 16, 2).astype(np.float32)
    out = forward_interpolate(flow)
    assert out.shape == (12, 16, 2)
    assert np.isfinite(out).all()
