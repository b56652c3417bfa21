"""Headroom probe: what do the encoder norms COST in serving?

The round-5 copy dump (tools/dump_copies.py) attributes the standalone
%copy family (7.75 ms of a ~43 ms forward) mostly to relayouts around the
fnet/cnet norm+relu chains between convolutions.  Swap each encoder's
norm_fn to 'none' (numerically WRONG — speed probe only) and bench.

Single-variant-per-process (a multi-model process wedged the axon tunnel
twice on 2026-08-20; child isolation contains that).  Interleave arms by
alternating invocations:

    for r in 1 2 3; do
      for v in base fnet_none cnet_none both_none; do
        python tools/bench_norm_cost.py $v >> /tmp/norm_cost.jsonl
      done
    done
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

VARIANTS = {
    "base": {},                                  # instance fnet, batch cnet
    "fnet_none": {"instance": "none"},
    "cnet_none": {"batch": "none"},
    "both_none": {"instance": "none", "batch": "none"},
    "fnet_mean": {"instance": "instance_mean"},  # plain-reduce stats
    "fnet_dot2": {"instance": "instance_dot2"},  # no-reshape dot stats
    # constant per-tensor affine: keeps the elementwise chain between convs
    # but removes the stats reduction — separates "reductions cost 6 ms"
    # from "any conv->elementwise->conv break costs 6 ms".
    "fnet_constaffine": {"instance": "constaffine"},
    # 128-ch stem + stage1 (SPEED PROBE, wrong param shapes vs reference):
    # tests whether full-lane channel counts flip XLA out of the blocked
    # conv layouts whose stats-reduce relayouts cost ~6 ms/frame.
    "wide128": {},
}
name = sys.argv[1] if len(sys.argv) > 1 else "base"
remap = VARIANTS[name]

_orig_make_norm = enc.make_norm


def patched(norm_fn, features, train, dtype=jnp.float32):
    norm_fn = remap.get(norm_fn, norm_fn)
    if norm_fn == "constaffine":
        return lambda x: (x - jnp.asarray(0.1, x.dtype)) * \
            jnp.asarray(1.1, x.dtype)
    if norm_fn.startswith("instance_"):
        from craft_tpu.nn.layers import InstanceNorm
        return InstanceNorm(dtype=dtype, stats=norm_fn[len("instance_"):])
    return _orig_make_norm(norm_fn, features, train, dtype)


enc.make_norm = patched
if name == "wide128":
    enc.STEM_DIM = 128
    enc.STAGE_DIMS = ((128, 1), (96, 2), (128, 2))
if "batch" in remap:
    # The BN->conv fold keys off norm_fn == 'batch' (still true under the
    # remap) and would hand the fold helper the 'none' identity lambda;
    # bypass folding so the remapped norm applies as-is.
    enc._conv_bn_folded = lambda conv, bn, x: bn(conv(x))

H, W = 436, 1024
rng = np.random.RandomState(0)
img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
padder = InputPadder((1, H, W, 3), mode="sintel")
jimg1, jimg2 = padder.pad(jnp.asarray(img1), jnp.asarray(img2))

cfg = craft_config(mixed_precision=True)
model = FlowModel(cfg=cfg, train=False)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                       jnp.zeros((1, 128, 128, 3)), iters=1)


def forward(v, a, b):
    _, flows = model.apply(v, a, b, iters=12)
    return flows[-1]


f = jax.jit(forward)
t0 = time.perf_counter()
np.asarray(f(variables, jimg1, jimg2))
print(f"# [{name}] compile+first: {time.perf_counter() - t0:.1f} s",
      file=sys.stderr, flush=True)

n_trials, n_iters = 3, 10
fps = []
for _ in range(n_trials):
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = f(variables, jimg1, jimg2)
    _ = float(jnp.sum(out))
    fps.append(n_iters / (time.perf_counter() - t0))
print(json.dumps({"variant": name,
                  "fps_trials": [round(x, 3) for x in fps],
                  "median_fps": round(float(np.median(fps)), 3)}))
