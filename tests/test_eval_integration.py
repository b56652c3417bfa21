"""End-to-end evaluation over synthetic on-disk datasets: exercises dataset
catalogs, IO codecs, padding, the jitted evaluator, F1-all, and the shift
protocol without real benchmark data."""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def _write_sintel(root, rng, scenes=("alley_1", "ambush_2"), frames=3,
                  H=64, W=128):
    from craft_tpu.data.frame_utils import write_flo

    for scene in scenes:
        img_dir = os.path.join(root, "training", "clean", scene)
        final_dir = os.path.join(root, "training", "final", scene)
        flow_dir = os.path.join(root, "training", "flow", scene)
        os.makedirs(img_dir)
        os.makedirs(final_dir)
        os.makedirs(flow_dir)
        for i in range(frames):
            img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{img_dir}/frame_{i + 1:04d}.png")
            Image.fromarray(img).save(f"{final_dir}/frame_{i + 1:04d}.png")
            if i < frames - 1:
                flow = rng.uniform(-2, 2, (H, W, 2)).astype(np.float32)
                write_flo(f"{flow_dir}/frame_{i + 1:04d}.flo", flow)


def _write_kitti(root, rng, n=2, H=64, W=120):
    from craft_tpu.data.frame_utils import write_flow_kitti

    img_dir = os.path.join(root, "training", "image_2")
    flow_dir = os.path.join(root, "training", "flow_occ")
    os.makedirs(img_dir)
    os.makedirs(flow_dir)
    for i in range(n):
        for suf in ("10", "11"):
            img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{img_dir}/{i:06d}_{suf}.png")
        flow = rng.uniform(-10, 10, (H, W, 2)).astype(np.float32)
        write_flow_kitti(f"{flow_dir}/{i:06d}_10.png", flow)


@pytest.fixture(scope="module")
def raft_setup():
    import jax
    import jax.numpy as jnp

    from craft_tpu.config import raft_config
    from craft_tpu.models.flow_model import FlowModel

    cfg = raft_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                           jnp.zeros((1, 64, 128, 3)), iters=1)
    return cfg, variables


def test_validate_sintel_synthetic(tmp_path_factory, rng, raft_setup):
    from craft_tpu.eval.evaluate import validate_sintel

    cfg, variables = raft_setup
    root = str(tmp_path_factory.mktemp("data"))
    _write_sintel(os.path.join(root, "Sintel"), rng)
    res = validate_sintel(cfg, variables, iters=2, data_root=root,
                          dstype="clean")
    assert "sintel_clean_epe" in res
    assert np.isfinite(res["sintel_clean_epe"])
    # Batched eval gives the same numbers.
    res_b = validate_sintel(cfg, variables, iters=2, data_root=root,
                            dstype="clean", batch_size=4)
    np.testing.assert_allclose(res_b["sintel_clean_epe"],
                               res["sintel_clean_epe"], rtol=1e-5)


def test_validate_sintel_shifted(tmp_path_factory, rng, raft_setup):
    from craft_tpu.eval.evaluate import validate_sintel

    cfg, variables = raft_setup
    root = str(tmp_path_factory.mktemp("data"))
    _write_sintel(os.path.join(root, "Sintel"), rng, scenes=("alley_1",),
                  frames=2)
    res = validate_sintel(cfg, variables, iters=2, data_root=root,
                          dstype="clean", xy_shift=(16, 8))
    assert np.isfinite(res["sintel_clean_epe"])


def test_validate_kitti_synthetic(tmp_path_factory, rng, raft_setup):
    from craft_tpu.eval.evaluate import validate_kitti

    cfg, variables = raft_setup
    root = str(tmp_path_factory.mktemp("data"))
    _write_kitti(os.path.join(root, "KITTI"), rng)
    res = validate_kitti(cfg, variables, iters=2, data_root=root)
    assert "kitti_epe" in res and "kitti_f1" in res
    assert 0 <= res["kitti_f1"] <= 100


def test_sintel_submission_synthetic(tmp_path_factory, rng, raft_setup):
    from craft_tpu.data.frame_utils import read_flo
    from craft_tpu.eval.submission import create_sintel_submission

    cfg, variables = raft_setup
    root = str(tmp_path_factory.mktemp("data"))
    _write_sintel(os.path.join(root, "Sintel"), rng, scenes=("alley_1",),
                  frames=3)
    out = str(tmp_path_factory.mktemp("subm"))
    create_sintel_submission(cfg, variables, data_root=root, warm_start=True,
                             output_path=out, iters=2, split="training")
    flo = read_flo(os.path.join(out, "clean", "alley_1", "frame0001.flo"))
    assert flo.shape == (64, 128, 2)
    assert np.isfinite(flo).all()


def test_validate_sintel_per_iteration(tmp_path_factory, rng, raft_setup):
    from craft_tpu.eval.evaluate import _validate_dense
    from craft_tpu.data import datasets as ds

    cfg, variables = raft_setup
    root = str(tmp_path_factory.mktemp("data"))
    _write_sintel(os.path.join(root, "Sintel"), rng, scenes=("alley_1",),
                  frames=2)
    dataset = ds.MpiSintel(split="training", dstype="clean",
                           root=os.path.join(root, "Sintel"))
    res = _validate_dense(cfg, variables, dataset, "s", iters=3, test_mode=2)
    assert "s_iter0_epe" in res and "s_iter2_epe" in res
    assert np.isfinite(res["s_iter0_epe"])
