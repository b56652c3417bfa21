"""One process of a simulated multi-host training job (reference
train_ddp.py:186-200 semantics executed for real: N processes,
jax.distributed rendezvous, global mesh, per-process loader shard, gradient
all-reduce inside the jitted step).

Launched by tests/test_distributed.py with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID set and 4 virtual CPU devices per process; runs
STEPS sharded train steps on a deterministic synthetic global batch and
writes its view of the metrics + a param checksum to --out as JSON.
"""
import argparse
import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

STEPS = 3
GLOBAL_B, H, W = 8, 64, 64


def global_batch():
    rng = np.random.RandomState(42)
    return {
        "image1": rng.uniform(0, 255, (GLOBAL_B, H, W, 3)).astype(np.float32),
        "image2": rng.uniform(0, 255, (GLOBAL_B, H, W, 3)).astype(np.float32),
        "flow": rng.uniform(-1, 1, (GLOBAL_B, H, W, 2)).astype(np.float32),
        "valid": np.ones((GLOBAL_B, H, W), np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from craft_tpu.parallel.mesh import (initialize_distributed,
                                         make_data_mesh, replicate_state,
                                         shard_batch)

    initialize_distributed()
    pid, nproc = jax.process_index(), jax.process_count()
    assert nproc == int(os.environ["NUM_PROCESSES"])

    from craft_tpu.config import raft_config
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    cfg = raft_config(mixed_precision=False)
    state, tx, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_shape=(H, W), lr=1e-3,
                                      num_steps=50)
    mesh = make_data_mesh()
    state = replicate_state(mesh, state)
    step_fn = jax.jit(make_train_step(cfg, tx, iters=2))

    # Per-process contiguous shard of the deterministic global batch — the
    # loader-side DistributedSampler analog (make_array_from_process_local_data
    # lays process-local rows contiguously along the global batch axis).
    full = global_batch()
    lo, hi = pid * (GLOBAL_B // nproc), (pid + 1) * (GLOBAL_B // nproc)
    local = {k: v[lo:hi] for k, v in full.items()}

    out = {"steps": []}
    key = jax.random.PRNGKey(1)
    for _ in range(STEPS):
        batch = shard_batch(mesh, local)
        state, metrics = step_fn(state, batch, key)
        out["steps"].append({k: float(jax.device_get(v))
                             for k, v in metrics.items()})
    flat = jax.tree.leaves(jax.device_get(state.params))
    out["param_l2"] = float(np.sqrt(sum(float((np.asarray(x) ** 2).sum())
                                        for x in flat)))
    out["process_index"] = pid
    out["n_global_devices"] = len(jax.devices())
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"proc {pid} done: {out['steps'][-1]}", flush=True)


if __name__ == "__main__":
    main()
