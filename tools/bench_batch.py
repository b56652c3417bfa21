"""Batched inference throughput at Sintel size (serving configuration)."""
import sys, time
sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np
from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.ops.geometry import InputPadder

cfg = craft_config(mixed_precision=True)
model = FlowModel(cfg=cfg, train=False)
H, W = 436, 1024
rng = np.random.RandomState(0)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                       jnp.zeros((1, 128, 128, 3)), iters=1)

@jax.jit
def forward(v, a, b):
    return model.apply(v, a, b, iters=12)[1][-1]

for B in (2, 4, 8):
    img = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    p = InputPadder(img.shape, mode="sintel")
    a, b = p.pad(jnp.asarray(img), jnp.asarray(img[::-1].copy()))
    out = forward(variables, a, b)
    _ = float(jnp.sum(out))
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = forward(variables, a, b)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    print(f"batch {B}: {dt*1000:.1f} ms -> {B/dt:.2f} frame-pairs/s/chip",
          flush=True)
