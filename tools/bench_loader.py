"""Loader-only throughput: synthetic FlyingChairs on disk -> full decode +
augmentation chain -> collated batches.  Publishes samples/s per backend vs
the train step's demand (~9 samples/s/chip at the chairs config).

Usage: python tools/bench_loader.py [num_workers ...]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")


def write_chairs(root, n=64, H=384, W=512):
    from craft_tpu.data.frame_utils import write_flo

    rng = np.random.RandomState(0)
    data = os.path.join(root, "FlyingChairs_release", "data")
    os.makedirs(data)
    for i in range(n):
        for k in (1, 2):
            img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{data}/{i + 1:05d}_img{k}.ppm")
        flow = rng.uniform(-3, 3, (H, W, 2)).astype(np.float32)
        write_flo(f"{data}/{i + 1:05d}_flow.flo", flow)
    np.savetxt(os.path.join(root, "FlyingChairs_release",
                            "FlyingChairs_train_val.txt"),
               np.ones(n, np.int32), fmt="%d")


def bench(loader, name, batch_size, warm_batches=2):
    it = iter(loader)
    for _ in range(warm_batches):
        next(it)
    n = 0
    t0 = time.perf_counter()
    for batch in it:
        n += batch["image1"].shape[0]
    dt = time.perf_counter() - t0
    print(f"{name:28s} {n / dt:7.2f} samples/s "
          f"({dt / (n / batch_size) * 1000:6.1f} ms/batch)", flush=True)


def main():
    from craft_tpu.data.datasets import fetch_training_dataset
    from craft_tpu.data.loader import MultiprocessLoader, ShardedLoader

    workers = [int(w) for w in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        write_chairs(root)
        ds = fetch_training_dataset("chairs", (368, 496), data_root=root)
        print(f"host cores: {os.cpu_count()}; dataset: {len(ds)} pairs; "
              "full aug chain at 368x496 crops")
        for w in workers:
            bench(MultiprocessLoader(ds, 8, num_workers=w, seed=1),
                  f"process backend ({w}w)", 8)
            bench(ShardedLoader(ds, 8, num_workers=w, seed=1),
                  f"thread backend ({w}w)", 8)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
