"""Round-5 interleaved serving A/B over compiler/scan variants.

The r4 trace table (BENCH_NOTES) shows the headline forward dominated by
%while (19.5 ms — the 12-iteration refinement scan) and %copy (7.8 ms of
relayouts).  Candidates here attack both without changing values:

  base     — the committed serving config (plain jit, scan_unroll=1)
  vmem64   — xla_tpu_scoped_vmem_limit_kib=65536 (the TRAIN step already
             ships this: 414.8 vs 464.3 ms/step in the r3 A/B; serving
             never got the flag)
  vmem128  — 128 MB scoped-VMEM budget
  licm     — xla_tpu_licm_size_inflation_ratio=16 (hoist loop-invariant
             operands out of the refinement scan)
  unroll2  — scan unroll=2 (wider fusion windows across iterations, half
             the loop boundaries)
  unroll3  — scan unroll=3

All variants are compiled first, outputs equality-checked against base,
then trials INTERLEAVE round-robin so chip drift hits every arm equally.

    python tools/bench_serving_variants.py [variant ...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax

jax = setup_jax()
import jax.numpy as jnp
import numpy as np

from craft_tpu.config import craft_config
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.ops.geometry import InputPadder

VARIANTS = {
    "base": (1, None),
    "vmem64": (1, {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    "vmem128": (1, {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    "licm": (1, {"xla_tpu_licm_size_inflation_ratio": "16"}),
    "unroll2": (2, None),
    "unroll3": (3, None),
    "unroll2v": (2, {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
}
names = sys.argv[1:] or ["base", "vmem64", "vmem128", "licm", "unroll2",
                         "unroll3"]

H, W = 436, 1024
rng = np.random.RandomState(0)
img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
padder = InputPadder((1, H, W, 3), mode="sintel")
jimg1, jimg2 = padder.pad(jnp.asarray(img1), jnp.asarray(img2))

base_model = FlowModel(cfg=craft_config(mixed_precision=True), train=False)
variables = base_model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 128, 128, 3)),
                            jnp.zeros((1, 128, 128, 3)), iters=1)

fns = {}
for name in names:
    unroll, opts = VARIANTS[name]
    cfg = craft_config(mixed_precision=True).replace(scan_unroll=unroll)
    model = FlowModel(cfg=cfg, train=False)

    def forward(v, a, b, _model=model):
        lowres, flows = _model.apply(v, a, b, iters=12)
        return flows[-1]

    fns[name] = jax.jit(forward, compiler_options=opts)

outs = {}
for name in names:
    t0 = time.perf_counter()
    outs[name] = np.asarray(fns[name](variables, jimg1, jimg2))
    print(f"# [{name}] compile+first: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr, flush=True)
for name in names[1:]:
    d = float(np.max(np.abs(outs[name] - outs[names[0]])))
    print(f"# max |{name} - {names[0]}| = {d:.3e}", file=sys.stderr,
          flush=True)

n_rounds, n_iters = 5, 10
fps = {m: [] for m in names}
for r in range(n_rounds):
    for m in names:
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fns[m](variables, jimg1, jimg2)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n_iters
        fps[m].append(1.0 / dt)

result = {}
for m in names:
    arr = np.asarray(fps[m])
    q1, q3 = np.percentile(arr, [25, 75])
    result[m] = {"median_fps": round(float(np.median(arr)), 3),
                 "iqr": [round(float(q1), 3), round(float(q3), 3)],
                 "trials": [round(float(f), 3) for f in arr]}
print(json.dumps(result, indent=1))
