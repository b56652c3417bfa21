"""50-step TPU training smoke at the chairs config: loss must trend down on a
fixed synthetic batch (overfit sanity on real hardware)."""
import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np
from craft_tpu.config import craft_config
from craft_tpu.training.train_step import create_train_state, make_train_step

H, W, B = 368, 496, 4
cfg = craft_config(mixed_precision=True)
state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                  image_shape=(H, W), lr=1e-4, num_steps=200)
step = jax.jit(make_train_step(cfg, tx, iters=12), donate_argnums=(0,))
rng = np.random.RandomState(0)
batch = {
    "image1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "image2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "flow": rng.uniform(-5, 5, (B, H, W, 2)).astype(np.float32),
    "valid": np.ones((B, H, W), np.float32),
}
key = jax.random.PRNGKey(1)
losses = []
for i in range(50):
    state, metrics = step(state, batch, key)
    if i % 10 == 0 or i == 49:
        l = float(np.asarray(metrics["loss"]))
        losses.append(l)
        print(f"step {i:3d}  loss {l:.4f}  epe "
              f"{float(np.asarray(metrics['epe'])):.3f}", flush=True)
assert losses[-1] < losses[0], losses
print("TRAIN SMOKE OK")
