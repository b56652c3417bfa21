"""Headline benchmark: full-CRAFT inference throughput at Sintel size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md): 436x1024 input (padded to 440x1024), 12 refinement
iterations, full CRAFT (f2 transformer + SETrans intra attention), bf16 mixed
precision with fp32 correlation — the flagship eval configuration.

vs_baseline: the north-star target is >=3x A100 frame-pairs/sec/chip.  The
reference publishes no A100 fps; RAFT-family torch implementations of this size
run ~3.3 frame-pairs/s on A100 at Sintel resolution (794 GFLOPs fwd,
logs/craft-intra4-flops.txt), making the 3x target ~10 fps/chip.
vs_baseline = fps / 10.0, so 1.0 means the target is met.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_FPS = 10.0  # 3x the ~3.3 fps A100 torch estimate (see docstring)


def main(profile: bool = False,
         profile_dir: str = "/tmp/craft_tpu_bench_trace"):
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
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    padder = InputPadder((1, H, W, 3), mode="sintel")
    jimg1, jimg2 = padder.pad(jnp.asarray(img1), jnp.asarray(img2))

    init_sized = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), init_sized, init_sized,
                           iters=1)

    @jax.jit
    def forward(variables, a, b):
        # upsample_mode comes from the config (default 'all').  The round-5
        # interleaved same-session A/B (tools/bench_ab_upsample.py) measured
        # 'all' 23.49 fps vs 'packed' 20.90 — the r4 headline drop was the
        # unmeasured packed switch, now reverted.  'final' also measured
        # slower (21.2-21.4): the in-scan upsample overlaps with the
        # iteration's other work.  See BENCH_NOTES "round 5".
        from craft_tpu.ops.geometry import unpack_upsampled
        lowres, flows = model.apply(variables, a, b, iters=12,
                                    upsample_mode=cfg.upsample_mode)
        out = flows[-1]
        if cfg.upsample_mode == "packed":
            out = unpack_upsampled(out)
        return out

    # Warmup / compile.  Force a device->host transfer to ensure completion —
    # block_until_ready alone can return early through the axon tunnel.
    out = forward(variables, jimg1, jimg2)
    _ = float(jnp.sum(out))

    # >=5 timed trials, median + IQR reported: the bench chip has shown
    # multi-x wall-clock drift within minutes (BENCH_NOTES r3), so a single
    # best-of number carries an uncharacterized error bar.
    n_trials, n_iters = 5, 10
    trial_fps = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = forward(variables, jimg1, jimg2)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n_iters
        trial_fps.append(1.0 / dt)
    fps = float(np.median(trial_fps))
    q1, q3 = np.percentile(trial_fps, [25, 75])

    if profile:
        # One traced run + the top-self-time table, so every perf claim can
        # ship with its trace (tools/parse_trace.py on profile_dir).
        import jax.profiler
        jax.profiler.start_trace(profile_dir)
        for _ in range(3):
            out = forward(variables, jimg1, jimg2)
        _ = float(jnp.sum(out))
        jax.profiler.stop_trace()
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from parse_trace import top_op_families
        print(f"# trace: {profile_dir} (3 runs)", file=sys.stderr)
        for nm, ms in top_op_families(profile_dir, n_runs=3)[:10]:
            print(f"# {ms:9.3f} ms  {nm[:80]}", file=sys.stderr)

    print(json.dumps({
        "metric": "craft_full_inference_fps_436x1024",
        "value": round(fps, 3),
        "unit": "frame-pairs/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "trials": [round(f, 3) for f in trial_fps],
        "iqr": [round(float(q1), 3), round(float(q3), 3)],
    }))


if __name__ == "__main__":
    main(profile="--profile" in sys.argv[1:])
