"""Training-loop smoke tests: loss decreases when overfitting a tiny synthetic
batch; optimizer schedule parity; loader behavior; checkpoint roundtrip."""

import numpy as np
import pytest


def _tiny_batch(rng, B=2, H=64, W=64):
    return {
        "image1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
        "image2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
        "flow": rng.uniform(-1, 1, (B, H, W, 2)).astype(np.float32),
        "valid": np.ones((B, H, W), np.float32),
    }


@pytest.mark.slow
def test_train_step_loss_decreases(rng):
    import jax

    from craft_tpu.config import raft_config
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    cfg = raft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(64, 64), lr=1e-3,
                                      num_steps=50)
    step = jax.jit(make_train_step(cfg, tx, iters=2))
    batch = _tiny_batch(rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_batch_stats_update_and_freeze(rng):
    import jax

    from craft_tpu.config import raft_config
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    cfg = raft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(64, 64), num_steps=50)
    batch = _tiny_batch(rng)

    step = jax.jit(make_train_step(cfg, tx, iters=1))
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    after = jax.tree.leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), \
        "BN stats should update when training"

    step_f = jax.jit(make_train_step(cfg, tx, iters=1, freeze_bn=True))
    state3, _ = step_f(state, batch, jax.random.PRNGKey(1))
    frozen = jax.tree.leaves(state3.batch_stats)[0]
    assert np.allclose(np.asarray(before), np.asarray(frozen)), \
        "BN stats must not update when frozen (reference freeze_bn)"


def test_onecycle_matches_torch():
    torch = pytest.importorskip("torch")
    from craft_tpu.training.optim import onecycle_linear

    max_lr, total = 2.5e-4, 1000
    sched = onecycle_linear(max_lr, total, pct_start=0.05)

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(m.parameters(), lr=max_lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=0.05,
        cycle_momentum=False, anneal_strategy="linear")
    torch_lrs = []
    for i in range(total - 1):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    ours = [float(sched(i)) for i in range(total - 1)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=2e-2, atol=1e-8)


def test_sharded_loader_determinism():
    from craft_tpu.data.loader import ShardedLoader

    class FakeDS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32), "extra_info": i}

    loader = ShardedLoader(FakeDS(), batch_size=4, num_workers=2, seed=7)
    b1 = [b["x"][:, 0, 0].tolist() for b in loader]
    assert len(b1) == 5
    # Two-process sharding covers disjoint halves.
    la = ShardedLoader(FakeDS(), 2, process_index=0, process_count=2, seed=7)
    lb = ShardedLoader(FakeDS(), 2, process_index=1, process_count=2, seed=7)
    seen_a = {v for b in la for v in b["x"][:, 0, 0].tolist()}
    seen_b = {v for b in lb for v in b["x"][:, 0, 0].tolist()}
    assert not (seen_a & seen_b)


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax

    from craft_tpu.config import raft_config
    from craft_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from craft_tpu.training.train_step import create_train_state

    cfg = raft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(64, 64), num_steps=10)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"total_steps": 5})
    state2, logger = load_checkpoint(path, state, load_optimizer_state=True,
                                     load_logger=True)
    assert logger["total_steps"] == 5
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_schedule_matches_device_schedule():
    from craft_tpu.training.optim import onecycle_linear, onecycle_linear_host

    max_lr, total = 2.5e-4, 1000
    dev = onecycle_linear(max_lr, total, pct_start=0.05)
    host = onecycle_linear_host(max_lr, total, pct_start=0.05)
    steps = [0, 1, 25, 49, 50, 51, 500, 998, 999, 1200]
    # The device schedule computes in float32; the host twin is float64.
    np.testing.assert_allclose([host(s) for s in steps],
                               [float(dev(s)) for s in steps],
                               rtol=2e-4, atol=1e-10)


@pytest.mark.slow
def test_loadsched_restores_schedule_position(tmp_path, rng):
    """--loadsched without --loadopt: fresh optimizer moments, but the LR
    schedule resumes from the checkpoint step (reference train.py:164-172)."""
    import jax

    from craft_tpu.config import raft_config
    from craft_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from craft_tpu.training.train_step import (TrainState, create_train_state,
                                               make_train_step)

    cfg = raft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(64, 64), num_steps=50)
    step_fn = jax.jit(make_train_step(cfg, tx, iters=1))
    batch = _tiny_batch(rng)
    for _ in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, jax.device_get(state), None)

    fresh, tx2, _ = create_train_state(cfg, jax.random.PRNGKey(2),
                                       image_shape=(64, 64), num_steps=50)
    resumed, _ = load_checkpoint(path, fresh, load_optimizer_state=False,
                                 load_scheduler_state=True)
    assert int(resumed.step) == 3
    # Every count in the (otherwise fresh) optimizer state advanced to 3,
    # so the OneCycle position resumes.
    counts = [int(leaf) for leaf in jax.tree.leaves(resumed.opt_state)
              if np.asarray(leaf).ndim == 0
              and np.issubdtype(np.asarray(leaf).dtype, np.integer)]
    assert counts and all(c == 3 for c in counts), counts
    # Moments stayed fresh (zero), unlike --loadopt.
    mu = resumed.opt_state[1][0].mu
    assert all(np.allclose(np.asarray(x), 0) for x in jax.tree.leaves(mu))
    # Without either flag, nothing resumes.
    plain, _ = load_checkpoint(path, fresh)
    assert int(plain.step) == 0


@pytest.mark.slow
def test_kill_resume_continuity(tmp_path, rng):
    """Crash/resume mid-schedule reproduces the uninterrupted run exactly:
    4 straight steps == (2 steps -> checkpoint -> restore with
    --loadopt --loadsched semantics -> 2 more steps), bit-for-bit in params
    and LR position (reference train.py:147-175 + VERDICT r2 #1)."""
    import jax

    from craft_tpu.config import raft_config
    from craft_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from craft_tpu.training.optim import onecycle_linear_host
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    cfg = raft_config(mixed_precision=False)
    batch = _tiny_batch(rng)
    key = jax.random.PRNGKey(1)

    def fresh_state(seed):
        return create_train_state(cfg, jax.random.PRNGKey(seed),
                                  image_shape=(64, 64), lr=1e-3,
                                  num_steps=20)

    state, tx, _ = fresh_state(0)
    step_fn = jax.jit(make_train_step(cfg, tx, iters=1))

    # Uninterrupted: 4 steps.
    straight = state
    for _ in range(4):
        straight, m_straight = step_fn(straight, batch, key)

    # Interrupted: 2 steps, checkpoint, re-init from a DIFFERENT seed (the
    # restart process), restore everything, 2 more steps.
    interrupted = state
    for _ in range(2):
        interrupted, _ = step_fn(interrupted, batch, key)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, jax.device_get(interrupted), {"k": 1})
    other, _, _ = fresh_state(99)
    resumed, logger = load_checkpoint(path, other, load_optimizer_state=True,
                                      load_scheduler_state=True,
                                      load_logger=True)
    assert int(resumed.step) == 2 and logger["k"] == 1
    host_lr = onecycle_linear_host(1e-3, 20 + 100)
    assert host_lr(int(resumed.step)) == host_lr(2)  # LR position continuous
    for _ in range(2):
        resumed, m_resumed = step_fn(resumed, batch, key)

    assert int(resumed.step) == int(straight.step) == 4
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(m_resumed["loss"]),
                               float(m_straight["loss"]), rtol=1e-6)


def test_f2_half_rejected():
    import argparse

    import pytest as _pytest

    from craft_tpu.cli import add_model_args, model_config_from_args

    p = argparse.ArgumentParser()
    add_model_args(p)
    args = p.parse_args(["--craft", "--f2", "half"])
    with _pytest.raises(SystemExit, match="f2 half"):
        model_config_from_args(args)


@pytest.mark.slow
def test_attn_diag_metrics(rng):
    """--attn_diag parity with the reference's periodic attention-health
    prints (setrans.py:520-536): the diag-enabled step must fold max_attn /
    clamp_frac / avg_abs_attn into the metrics dict."""
    import jax

    from craft_tpu.config import craft_config
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    cfg = craft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(64, 64), lr=1e-3,
                                      num_steps=50)
    step = jax.jit(make_train_step(cfg, tx, iters=1, attn_diag=True))
    batch = _tiny_batch(rng)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    for key in ("attn_max", "attn_clamp_frac", "attn_avg_abs"):
        assert key in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[key])), (key, metrics[key])
    assert 0.0 <= float(metrics["attn_clamp_frac"]) <= 1.0

    # The plain step must NOT carry the diagnostics keys (fast path).
    plain = jax.jit(make_train_step(cfg, tx, iters=1))
    _, metrics2 = plain(state, batch, jax.random.PRNGKey(1))
    assert "attn_max" not in metrics2
