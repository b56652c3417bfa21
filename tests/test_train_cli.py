"""End-to-end trainer CLI: synthetic FlyingChairs on disk -> craft_tpu.train
main() for a few steps -> checkpoint written and restorable."""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def _write_chairs(root, rng, n=6, H=80, W=96):
    from craft_tpu.data.frame_utils import write_flo

    data = os.path.join(root, "FlyingChairs_release", "data")
    os.makedirs(data)
    for i in range(n):
        for k in (1, 2):
            img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{data}/{i + 1:05d}_img{k}.ppm")
        flow = rng.uniform(-3, 3, (H, W, 2)).astype(np.float32)
        write_flo(f"{data}/{i + 1:05d}_flow.flo", flow)
    split = np.ones(n, np.int32)
    split[-1] = 2  # one validation sample
    np.savetxt(os.path.join(root, "FlyingChairs_release",
                            "FlyingChairs_train_val.txt"), split, fmt="%d")


def test_train_cli_chairs(tmp_path, rng):
    from craft_tpu.train import main

    root = str(tmp_path / "datasets")
    _write_chairs(root, rng)
    out = str(tmp_path / "run")
    main([
        "--name", "test-raft", "--stage", "chairs", "--raft",
        "--num_steps", "3", "--batch_size", "2", "--lr", "1e-4",
        "--image_size", "64", "64", "--workers", "1",
        "--val_freq", "1000", "--print_freq", "2",
        "--data_root", root, "--output", out,
    ])
    assert os.path.isdir(os.path.join(out, "test-raft"))

    # Restore the final checkpoint into a fresh state.
    import jax
    from craft_tpu.config import raft_config
    from craft_tpu.training.checkpoint import load_checkpoint
    from craft_tpu.training.train_step import create_train_state

    cfg = raft_config(mixed_precision=False)
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(1),
                                     image_shape=(64, 64), num_steps=10)
    restored, _ = load_checkpoint(os.path.join(out, "test-raft"), state)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b)), \
        "restored params should differ from fresh init"
