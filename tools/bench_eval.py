"""End-to-end eval wall-time: synthetic Sintel-layout data on disk -> the
real validate_sintel pipeline (decode, pad, jitted forward, metrics).

Reports pairs/s with the prefetching iterator vs serial loading
(VERDICT r1 #10: the TPU idled on PNG decode between forwards).

Usage: python tools/bench_eval.py [n_pairs]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def write_sintel(root, n_pairs, H=436, W=1024):
    from PIL import Image

    from craft_tpu.data.frame_utils import write_flo

    rng = np.random.RandomState(0)
    scene = os.path.join(root, "Sintel", "training")
    img_dir = os.path.join(scene, "clean", "alley_1")
    flow_dir = os.path.join(scene, "flow", "alley_1")
    os.makedirs(img_dir)
    os.makedirs(flow_dir)
    for i in range(n_pairs + 1):
        img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(f"{img_dir}/frame_{i + 1:04d}.png")
        if i < n_pairs:
            write_flo(f"{flow_dir}/frame_{i + 1:04d}.flo",
                      rng.uniform(-3, 3, (H, W, 2)).astype(np.float32))


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    root = tempfile.mkdtemp(prefix="bench_eval_")
    try:
        write_sintel(root, n_pairs)
        from craft_tpu.utils.jax_setup import setup_jax
        jax = setup_jax()
        import jax.numpy as jnp

        from craft_tpu.config import craft_config
        from craft_tpu.eval import evaluate as ev
        from craft_tpu.models.flow_model import FlowModel

        cfg = craft_config(mixed_precision=True)
        model = FlowModel(cfg=cfg, train=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 64, 64, 3)), iters=1)

        for label, prefetch in (("prefetch", True), ("serial", False)):
            if not prefetch:  # monkeypatch the iterator to serial
                orig = ev._prefetch
                ev._prefetch = lambda gen, depth=3: gen
            # warm the compile cache with one pass
            ev.validate_sintel(cfg, variables, iters=12, data_root=root,
                               dstype="clean", max_val_count=2)
            t0 = time.perf_counter()
            ev.validate_sintel(cfg, variables, iters=12, data_root=root,
                               dstype="clean")
            dt = time.perf_counter() - t0
            print(f"{label:9s}: {n_pairs} pairs in {dt:.1f} s = "
                  f"{n_pairs / dt:.2f} pairs/s", flush=True)
            if not prefetch:
                ev._prefetch = orig
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
