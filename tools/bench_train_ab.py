"""Training-throughput A/B harness (VERDICT r2 #2: >=12 samples/s/chip at
the chairs config).  Variants are selected by argv so every timing comes
from a fresh process (no cross-variant compilation-cache or HBM effects):

    python tools/bench_train_ab.py baseline
    python tools/bench_train_ab.py unroll2 | unroll3 | unroll4 | unroll6
    python tools/bench_train_ab.py batch5 | batch6
    python tools/bench_train_ab.py flags    # XLA flag experiment via env
"""
import os
import sys
import time

variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"

# XLA flag experiments.  XLA_FLAGS cannot carry TPU-specific flags on this
# platform (the local jaxlib's parse_flags_from_env aborts on flags only the
# remote TPU compiler knows), so they go through jit(compiler_options=...),
# which the axon remote-compile path validates and honors (a bogus option
# name errors).  vmem64/vmem128 raise the scoped-VMEM budget XLA's
# fusion/conv emitters may use (default 16 MB-ish); licm raises the
# while-loop invariant-code-motion size cap so loop-constant operands can be
# hoisted out of the refinement scan.
_FLAG_VARIANTS = {
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem128": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "licm": {"xla_tpu_licm_size_inflation_ratio": "16"},
}
compiler_options = _FLAG_VARIANTS.get(variant)

sys.path.insert(0, "/root/repo")
from craft_tpu.utils.jax_setup import setup_jax  # noqa: E402

jax = setup_jax()
import numpy as np  # noqa: E402

from craft_tpu.config import craft_config  # noqa: E402
from craft_tpu.training.train_step import (create_train_state,  # noqa: E402
                                           make_train_step)

H, W = 368, 496
B = 4
unroll = 1
if variant.startswith("unroll"):
    unroll = int(variant[len("unroll"):])
elif variant.startswith("batch"):
    B = int(variant[len("batch"):])

cfg = craft_config(mixed_precision=True).replace(scan_unroll=unroll)
if variant == "xlaattn":
    # Disable the probs_vjp training path on the f2/intra sites (keeps the
    # corr_vjp inter site): isolates the training-side flash attention gain.
    import dataclasses
    cfg = cfg.replace(
        f2=dataclasses.replace(cfg.f2, use_pallas="off"),
        intra=dataclasses.replace(cfg.intra, use_pallas="off"))
elif variant == "noremat":
    # probs_vjp path + store the bf16 probs instead of recomputing the
    # f2/intra sites in the backward pass.
    cfg = cfg.replace(remat_att_sites=False)
elif variant in ("upall", "uppacked"):
    # Round-5 A/B of the training-side upsample layout (the serving-side A/B
    # picked 'all'; training also packs the GT in the loss, so it gets its
    # own measurement).
    cfg = cfg.replace(upsample_mode=variant[2:])
state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                  image_shape=(H, W), lr=2.5e-4,
                                  num_steps=1000)
from craft_tpu.utils.jax_setup import train_compiler_options  # noqa: E402

if compiler_options is None and variant != "novmem":
    compiler_options = train_compiler_options()  # the production default
step = jax.jit(make_train_step(cfg, tx, iters=12), donate_argnums=(0,),
               compiler_options=compiler_options)

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
_ = float(np.asarray(metrics["loss"]))
print(f"[{variant}] compile+first step: {time.perf_counter() - t0:.1f} s",
      flush=True)

n = 10
best = float("inf")
for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch, key)
    _ = float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / n
    best = min(best, dt)
    print(f"[{variant}] rep{rep}: {dt * 1000:.1f} ms/step "
          f"({B / dt:.2f} samples/s)", flush=True)
print(f"[{variant}] BEST: {best * 1000:.1f} ms/step "
      f"({B / best:.2f} samples/s, batch {B} @ {H}x{W}, unroll {unroll})")
