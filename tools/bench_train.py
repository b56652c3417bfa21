"""TPU training-step throughput at the reference chairs-stage config
(368x496 crop, batch 8, full CRAFT, 12 iters, bf16 mixed precision;
train-craft-f2full.sh stage 1).  Reference baseline: ~2 steps/s on 2 GPUs
(logs 'time' metric ~0.5 s/step)."""

import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax, train_compiler_options
jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.config import craft_config
from craft_tpu.training.train_step import create_train_state, make_train_step

H, W, B = 368, 496, 4  # per-chip batch; reference ran 4/GPU on 24 GB cards
cfg = craft_config(mixed_precision=True)
state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                  image_shape=(H, W), lr=2.5e-4,
                                  num_steps=1000)
step = jax.jit(make_train_step(cfg, tx, iters=12), donate_argnums=(0,),
               compiler_options=train_compiler_options())

rng = np.random.RandomState(0)
batch = {
    "image1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "image2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "flow": rng.uniform(-5, 5, (B, H, W, 2)).astype(np.float32),
    "valid": np.ones((B, H, W), np.float32),
}
key = jax.random.PRNGKey(1)

state, metrics = step(state, batch, key)
print("first step:", {k: float(np.asarray(v)) for k, v in metrics.items()})

n = 10
t0 = time.perf_counter()
for _ in range(n):
    state, metrics = step(state, batch, key)
_ = float(np.asarray(metrics["loss"]))
dt = (time.perf_counter() - t0) / n
print(f"train step: {dt * 1000:.1f} ms  ({1 / dt:.2f} steps/s, "
      f"batch {B} @ {H}x{W})")

if "--profile" in sys.argv:
    trace_dir = "/tmp/craft_tpu_train_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = step(state, batch, key)
        _ = float(np.asarray(metrics["loss"]))
    sys.path.insert(0, "/root/repo/tools")
    from parse_trace import top_op_families
    print(f"# trace: {trace_dir} (3 runs)")
    for name, ms in top_op_families(trace_dir, n_runs=3)[:15]:
        print(f"# {ms:>9.3f} ms  {name}")
