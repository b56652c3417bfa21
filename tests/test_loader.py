"""MultiprocessLoader: sampling parity with ShardedLoader, determinism,
ordering, and epoch coverage (reference DataLoader num_workers semantics,
core/datasets.py:569-577)."""

import numpy as np
import pytest


class _ArrayDataset:
    """Index-stamped synthetic dataset (picklable / fork-safe)."""

    def __init__(self, n=13, aug=False):
        self.n = n
        self.aug = aug

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng_val = np.random.uniform() if self.aug else 0.0
        return {
            "image1": np.full((4, 4, 3), i, np.float32),
            "image2": np.full((4, 4, 3), i + 0.5, np.float32),
            "flow": np.full((4, 4, 2), rng_val, np.float32),
            "valid": np.ones((4, 4), np.float32),
            "extra_info": (f"item{i}",),
        }


def _drain(loader):
    return list(loader)


def test_mp_loader_matches_thread_loader_order():
    from craft_tpu.data.loader import MultiprocessLoader, ShardedLoader

    ds = _ArrayDataset(13)
    kw = dict(batch_size=3, shuffle=True, drop_last=True, seed=7)
    a = _drain(MultiprocessLoader(ds, num_workers=3, **kw))
    b = _drain(ShardedLoader(ds, num_workers=2, **kw))
    assert len(a) == len(b) == 4
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["image1"], bb["image1"])
        assert ba["extra_info"] == bb["extra_info"]


def test_mp_loader_deterministic_with_augmentation():
    from craft_tpu.data.loader import MultiprocessLoader

    ds = _ArrayDataset(12, aug=True)
    kw = dict(batch_size=2, shuffle=True, num_workers=3, seed=5)
    a = _drain(MultiprocessLoader(ds, **kw))
    b = _drain(MultiprocessLoader(ds, **kw))
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["flow"], bb["flow"])

    # A new epoch reshuffles and reseeds.
    ldr = MultiprocessLoader(ds, **kw)
    e0 = _drain(ldr)
    e1 = _drain(ldr)
    assert any(not np.array_equal(x["image1"], y["image1"])
               for x, y in zip(e0, e1))


def test_mp_loader_epoch_coverage_and_sharding():
    from craft_tpu.data.loader import MultiprocessLoader

    ds = _ArrayDataset(16)
    seen = []
    for pi in range(2):
        ldr = MultiprocessLoader(ds, batch_size=2, shuffle=True,
                                 num_workers=2, process_index=pi,
                                 process_count=2, seed=3)
        for batch in ldr:
            seen.extend(batch["image1"][:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(16))
