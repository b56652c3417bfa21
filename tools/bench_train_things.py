"""TPU training-step throughput at the reference things-stage config
(400x720 crop, batch 3 per chip; train-craft-f2full.sh stage 2) — the
crop where the probs backward's VMEM guard shrinks its q tile (U2p ~4608).
Reference wall: stage-2 logs ~0.9 s/step on 2 GPUs.

    python tools/bench_train_things.py [H W B]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax, train_compiler_options

jax = setup_jax()
import numpy as np

from craft_tpu.config import craft_config
from craft_tpu.training.train_step import create_train_state, make_train_step

args = [int(a) for a in sys.argv[1:4]]
H, W, B = (args + [400, 720, 3])[:3] if args else (400, 720, 3)
cfg = craft_config(mixed_precision=True)
state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                  image_shape=(H, W), lr=1.25e-4,
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

t0 = time.perf_counter()
state, metrics = step(state, batch, key)
loss = float(np.asarray(metrics["loss"]))
print(f"# compile+first: {time.perf_counter() - t0:.1f} s, loss {loss:.4f}",
      file=sys.stderr, flush=True)

times = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = step(state, batch, key)
    _ = float(np.asarray(metrics["loss"]))
    times.append((time.perf_counter() - t0) / 5)
ms = sorted(t * 1000 for t in times)[1]
print(f"things-config step: {ms:.1f} ms wall median-of-3x5 "
      f"({B / (ms / 1000):.2f} samples/s, batch {B} @ {H}x{W})")
