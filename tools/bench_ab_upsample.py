"""Same-session A/B of upsample_mode 'all' vs 'packed' on the headline path.

VERDICT r4 weak #1: the final round-4 commit switched bench.py/Evaluator/train
step to the 'packed' upsample layout without a recorded A/B, so the 23.2->20.8
fps drop could not be attributed (layout change vs chip drift).  This tool
settles it: both modes compiled once, then INTERLEAVED trials (A,B,A,B,...)
within one session so drift affects both arms equally.  Median + IQR per arm.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax
jax = setup_jax()
import jax.numpy as jnp
import numpy as np
from functools import partial

from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.ops.geometry import InputPadder, unpack_upsampled

cfg = craft_config(mixed_precision=True)
model = FlowModel(cfg=cfg, train=False)
H, W = 436, 1024
rng = np.random.RandomState(0)
img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
padder = InputPadder((1, H, W, 3), mode="sintel")
jimg1, jimg2 = padder.pad(jnp.asarray(img1), jnp.asarray(img2))
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                       jnp.zeros((1, 128, 128, 3)), iters=1)


@partial(jax.jit, static_argnames=("mode",))
def forward(v, a, b, mode):
    lowres, flows = model.apply(v, a, b, iters=12, upsample_mode=mode)
    out = flows[-1]
    if mode == "packed":
        out = unpack_upsampled(out)
    return out

MODES = ("all", "packed")
# Compile both and check value equality first.
outs = {}
for m in MODES:
    outs[m] = np.asarray(forward(variables, jimg1, jimg2, m))
diff = float(np.max(np.abs(outs["all"] - outs["packed"])))
print(f"# max |all - packed| = {diff:.3e}", file=sys.stderr)

n_rounds, n_iters = 7, 10
fps = {m: [] for m in MODES}
for r in range(n_rounds):
    for m in MODES:
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = forward(variables, jimg1, jimg2, m)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n_iters
        fps[m].append(1.0 / dt)

result = {}
for m in MODES:
    arr = np.asarray(fps[m])
    q1, q3 = np.percentile(arr, [25, 75])
    result[m] = {"median_fps": round(float(np.median(arr)), 3),
                 "iqr": [round(float(q1), 3), round(float(q3), 3)],
                 "trials": [round(float(f), 3) for f in arr]}
print(json.dumps(result, indent=1))
