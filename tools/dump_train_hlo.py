"""Dump the optimized HLO of the chairs-config train step (AOT compile, no
execution) so slow fusions found in traces can be inspected op-by-op.

    python tools/dump_train_hlo.py [out.txt]
"""
import sys

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax, train_compiler_options
jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.config import craft_config
from craft_tpu.training.train_step import create_train_state, make_train_step

H, W, B = 368, 496, 4
cfg = craft_config(mixed_precision=True)
state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                  image_shape=(H, W), lr=2.5e-4,
                                  num_steps=1000)
step = jax.jit(make_train_step(cfg, tx, iters=12), donate_argnums=(0,),
               compiler_options=train_compiler_options())

batch = {
    "image1": jnp.zeros((B, H, W, 3), jnp.float32),
    "image2": jnp.zeros((B, H, W, 3), jnp.float32),
    "flow": jnp.zeros((B, H, W, 2), jnp.float32),
    "valid": jnp.ones((B, H, W), jnp.float32),
}
compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
txt = compiled.as_text()
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_hlo.txt"
open(out, "w").write(txt)
print(f"wrote {len(txt) / 1e6:.1f} MB to {out}")
