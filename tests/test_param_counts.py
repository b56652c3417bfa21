"""Exact parameter-count parity with the reference model zoo
(BASELINE.md: RAFT 5.26M / GMA 5.88M / CRAFT ~6.30M; counted by
train.py:40-41 — tied QK counts once in both frameworks)."""

import numpy as np
import pytest

from reference_oracle import build_reference_model, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="torch reference not available")


def _flax_count(cfg):
    import jax
    import jax.numpy as jnp
    from craft_tpu.models.flow_model import FlowModel

    model = FlowModel(cfg=cfg, train=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 64, 64, 3)), iters=1)
    return sum(x.size for x in jax.tree.leaves(v["params"]))


def _torch_count(model):
    # torch counts the tied K weight zero extra times (shared Parameter).
    seen = set()
    total = 0
    for p in model.parameters():
        if id(p) not in seen:
            seen.add(id(p))
            total += p.numel()
    return total


@pytest.mark.parametrize("arch,kwargs", [
    ("raft", {}),
    ("gma", {}),
    ("craft", {}),
])
def test_param_count_matches_reference(arch, kwargs):
    from craft_tpu.config import craft_config, gma_config, raft_config

    if arch == "raft":
        ref, _ = build_reference_model("raft")
        cfg = raft_config(mixed_precision=False)
    elif arch == "gma":
        ref, _ = build_reference_model(
            "craft", craft=False, f2trans="none", use_setrans=False)
        cfg = gma_config(mixed_precision=False)
    else:
        ref, _ = build_reference_model("craft")
        cfg = craft_config(mixed_precision=False)

    want = _torch_count(ref)
    got = _flax_count(cfg)
    assert got == want, f"{arch}: ours {got} vs reference {want}"
