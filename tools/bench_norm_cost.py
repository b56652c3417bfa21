"""Headroom probe: what do the encoder norms COST in serving?

The round-5 copy dump (tools/dump_copies.py) attributes the standalone
%copy family (7.75 ms of a ~43 ms forward) mostly to relayouts around the
fnet/cnet norm+relu chains between convolutions.  Before engineering any
fold/fusion, measure the ceiling: swap each encoder's norm_fn to 'none'
(numerically WRONG — this is a speed probe only, outputs are not compared)
and bench interleaved.  If fps doesn't move, the copies are not
norm-caused and folding is pointless.

    python tools/bench_norm_cost.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax

jax = setup_jax()
import jax.numpy as jnp
import numpy as np

import craft_tpu.nn.encoder as enc
from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.ops.geometry import InputPadder

H, W = 436, 1024
rng = np.random.RandomState(0)
img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
padder = InputPadder((1, H, W, 3), mode="sintel")
jimg1, jimg2 = padder.pad(jnp.asarray(img1), jnp.asarray(img2))

VARIANTS = {
    "base": {},                                  # instance fnet, batch cnet
    "fnet_none": {"instance": "none"},
    "cnet_none": {"batch": "none"},
    "both_none": {"instance": "none", "batch": "none"},
}

_orig_make_norm = enc.make_norm

fns, names = {}, list(VARIANTS)
for name in names:
    remap = VARIANTS[name]

    def patched(norm_fn, features, train, dtype=jnp.float32, _r=remap):
        return _orig_make_norm(_r.get(norm_fn, norm_fn), features, train,
                               dtype)

    enc.make_norm = patched
    cfg = craft_config(mixed_precision=True)
    model = FlowModel(cfg=cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)),
                           jnp.zeros((1, 128, 128, 3)), iters=1)

    def forward(v, a, b, _model=model):
        _, flows = _model.apply(v, a, b, iters=12)
        return flows[-1]

    f = jax.jit(forward)
    # Trace + compile while THIS variant's make_norm patch is active.
    t0 = time.perf_counter()
    np.asarray(f(variables, jimg1, jimg2))
    print(f"# [{name}] compile+first: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr, flush=True)
    fns[name] = (f, variables)

enc.make_norm = _orig_make_norm

n_rounds, n_iters = 5, 10
fps = {m: [] for m in names}
for r in range(n_rounds):
    for m in names:
        f, v = fns[m]
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = f(v, jimg1, jimg2)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n_iters
        fps[m].append(1.0 / dt)

result = {}
for m in names:
    arr = np.asarray(fps[m])
    q1, q3 = np.percentile(arr, [25, 75])
    result[m] = {"median_fps": round(float(np.median(arr)), 3),
                 "iqr": [round(float(q1), 3), round(float(q3), 3)],
                 "trials": [round(float(x), 3) for x in arr]}
print(json.dumps(result, indent=1))
