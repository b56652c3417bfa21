"""The analytic FLOPs breakdown must reproduce the reference fvcore table
(logs/craft-intra4-flops.txt; BASELINE.md: update_block 615G MACs,
f2 66G, fnet 62G, cnet 31G, corr 13.8G at Sintel size, 12 iters)."""

import numpy as np


def test_flops_match_reference_table():
    from craft_tpu.config import craft_config
    from craft_tpu.eval.flops import model_flops_breakdown

    bd = model_flops_breakdown(craft_config(), 440, 1024, 12)
    macs = {k: v / 2 for k, v in bd.items()}  # fvcore counts MACs
    assert abs(macs["update_block (x12)"] - 615) < 10
    assert abs(macs["f2_trans"] - 66) < 3
    assert abs(macs["fnet"] - 62) < 3
    assert abs(macs["cnet"] - 31) < 2
    assert abs(macs["corr_fn"] - 13.8) < 1
