"""Round-5 interleaved training A/B: upsample_mode 'all' vs 'packed'.

The serving-side A/B (tools/bench_ab_upsample.py) measured 'packed' as an
~11% regression and reverted the default to 'all'.  The TRAINING side is a
different trade: 'packed' keeps the per-iteration predictions in the
lane-aligned [iters, B, H/8, W/8, 128] layout through the scan AND switches
the loss to sequence_loss_packed (packs the GT once instead of unpacking
every prediction), so it gets its own measurement.  Both steps are compiled
once, then reps INTERLEAVE (A,B,A,B,...) in one session so chip drift hits
both arms equally.  Each arm keeps its own donated state.

Chairs config: batch 4, 368x496, 12 iters, bf16, production compiler opts.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax

jax = setup_jax()
import numpy as np

from craft_tpu.config import craft_config
from craft_tpu.training.train_step import create_train_state, make_train_step
from craft_tpu.utils.jax_setup import train_compiler_options

H, W, B = 368, 496, 4
MODES = ("all", "packed")

steps, states = {}, {}
for m in MODES:
    cfg = craft_config(mixed_precision=True).replace(upsample_mode=m)
    states[m], tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                          image_shape=(H, W), lr=2.5e-4,
                                          num_steps=1000)
    steps[m] = jax.jit(make_train_step(cfg, tx, iters=12),
                       donate_argnums=(0,),
                       compiler_options=train_compiler_options())

rng = np.random.RandomState(0)
batch = {
    "image1": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "image2": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
    "flow": rng.uniform(-5, 5, (B, H, W, 2)).astype(np.float32),
    "valid": np.ones((B, H, W), np.float32),
}
key = jax.random.PRNGKey(1)

losses = {}
for m in MODES:
    t0 = time.perf_counter()
    states[m], metrics = steps[m](states[m], batch, key)
    losses[m] = float(np.asarray(metrics["loss"]))
    print(f"# [{m}] compile+first step: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr, flush=True)
print(f"# loss all={losses['all']:.6f} packed={losses['packed']:.6f} "
      f"(same-function check; states differ after their own step 1)",
      file=sys.stderr, flush=True)

n_rounds, n_steps = 5, 5
ms = {m: [] for m in MODES}
for r in range(n_rounds):
    for m in MODES:
        t0 = time.perf_counter()
        for _ in range(n_steps):
            states[m], metrics = steps[m](states[m], batch, key)
        _ = float(np.asarray(metrics["loss"]))
        dt = (time.perf_counter() - t0) / n_steps
        ms[m].append(dt * 1000)

result = {}
for m in MODES:
    arr = np.asarray(ms[m])
    q1, q3 = np.percentile(arr, [25, 75])
    med = float(np.median(arr))
    result[m] = {"median_ms_per_step": round(med, 1),
                 "samples_per_s": round(B / (med / 1000), 2),
                 "iqr_ms": [round(float(q1), 1), round(float(q3), 1)],
                 "trials_ms": [round(float(x), 1) for x in arr]}

# Device time for the winning arm: the axon tunnel adds ~2x dispatch gap
# to wall time (r4 probs_vjp note: 439 ms device vs 918 ms wall), so the
# roofline argument needs the on-chip number too.  One traced window of 3
# steps, parsed for total + top op-family self-time.
if "--profile" in sys.argv:
    import jax.profiler

    sys.path.insert(0, "/root/repo/tools")
    import parse_trace as ptr

    tdir = "/tmp/craft_tpu_train_ab5_trace"
    m = MODES[0]
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        states[m], metrics = steps[m](states[m], batch, key)
    _ = float(np.asarray(metrics["loss"]))
    jax.profiler.stop_trace()
    fams = ptr.top_op_families(tdir, n_runs=3)
    total_ms = sum(v for _, v in fams)
    result["device_profile"] = {
        "arm": m,
        "device_ms_per_step": round(total_ms, 1),
        "top_families_ms": [[k, round(v, 2)] for k, v in fams[:12]],
    }
print(json.dumps(result, indent=1))
