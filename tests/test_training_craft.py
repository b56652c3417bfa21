"""CRAFT (full) training step smoke: remat'd attention sites, grads flow,
loss decreases, dropout rngs work."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def test_craft_train_step(rng):
    import jax

    from craft_tpu.config import craft_config
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    cfg = craft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(64, 64), lr=5e-4,
                                      num_steps=50)
    step = jax.jit(make_train_step(cfg, tx, iters=2))
    batch = {
        "image1": rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32),
        "image2": rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32),
        "flow": rng.uniform(-1, 1, (2, 64, 64, 2)).astype(np.float32),
        "valid": np.ones((2, 64, 64), np.float32),
    }
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # Dropout makes per-step loss noisy; require improvement somewhere in the
    # tail rather than a monotone last step.
    assert min(losses[2:]) < losses[0], losses
    assert float(metrics["grad_norm"]) > 0
