"""Golden parity: RAFT forward vs the torch reference with converted weights.

The gate for everything downstream (SURVEY.md §7 build order step 3): random
torch weights -> convert -> identical flow field to < 1e-4 px max deviation.
"""

import numpy as np
import pytest

from reference_oracle import build_reference_model, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="torch reference not available")


def test_raft_forward_parity():
    import torch
    import jax
    import jax.numpy as jnp

    from craft_tpu.config import raft_config
    from craft_tpu.models.flow_model import FlowModel
    from craft_tpu.utils.torch_convert import convert_torch_state

    ref, _ = build_reference_model("raft")
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = raft_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)
    rng = np.random.RandomState(0)
    # H/8 must be >= 16 so the coarsest pyramid level stays >= 2x2 (the torch
    # reference NaNs on 1-wide levels due to align_corners division by W-1=0).
    H, W = 128, 128
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img1),
                           jnp.asarray(img2), iters=1)
    variables, report = convert_torch_state(state, variables, strict=True)

    lowres, flows = model.apply(variables, jnp.asarray(img1),
                                jnp.asarray(img2), iters=4)

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        ref_low, ref_up = ref(t1, t2, iters=4, test_mode=1)

    ref_up = ref_up.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(flows[-1])
    err = np.abs(got - ref_up).max()
    assert err < 1e-4, f"max |flow diff| = {err}"

    ref_low = ref_low.numpy().transpose(0, 2, 3, 1)
    err_low = np.abs(np.asarray(lowres) - ref_low).max()
    assert err_low < 1e-4, f"max lowres diff = {err_low}"
