"""Golden parity: CRAFT variants vs the torch reference with converted weights.

Covers the SETrans stack end-to-end: sliding pos biases, tied/untied QK,
attention clamp, mode soft-aggregation, f2 transformer, intra attention +
aggregator, global volume norm (SURVEY.md §7 build order steps 5).
"""

import numpy as np
import pytest

from reference_oracle import build_reference_model, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="torch reference not available")


def _run_parity(arch, cfg, ref_kwargs=None, iters=3, tol=1e-4):
    import torch
    import jax
    import jax.numpy as jnp

    from craft_tpu.models.flow_model import FlowModel
    from craft_tpu.utils.torch_convert import convert_torch_state

    ref, _ = build_reference_model(arch, **(ref_kwargs or {}))
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = FlowModel(cfg=cfg, train=False)
    rng = np.random.RandomState(1)
    H, W = 128, 128
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img1),
                           jnp.asarray(img2), iters=1)
    variables, report = convert_torch_state(state, variables, strict=True)

    lowres, flows = model.apply(variables, jnp.asarray(img1),
                                jnp.asarray(img2), iters=iters)

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        _, ref_up = ref(t1, t2, iters=iters, test_mode=1)

    ref_up = ref_up.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(flows[-1])
    err = np.abs(got - ref_up).max()
    print(f"{arch}: max |flow diff| = {err:.2e}")
    assert err < tol, f"{arch}: max |flow diff| = {err}"
    return err


def test_craft_full_parity():
    from craft_tpu.config import craft_config
    _run_parity("craft", craft_config(mixed_precision=False))


def test_craft_gma_parity():
    from craft_tpu.config import craft_config
    _run_parity("craft", craft_config(mixed_precision=False, use_setrans=False),
                ref_kwargs={"use_setrans": False})


def test_craft_nogma_parity():
    from craft_tpu.config import craft_nogma_config
    # The reference craft_nogma has a fatal arity bug in its TransCorrBlock
    # call (craft_nogma.py:165 vs corr.py:148) — it cannot run f2trans='full'
    # at all.  Validate our nogma against the reference with f2trans='none'
    # monkey-patched update (single-way API).
    import torch

    from craft_tpu.models.flow_model import FlowModel
    from craft_tpu.utils.torch_convert import convert_torch_state
    import jax
    import jax.numpy as jnp

    ref, _ = build_reference_model("craft_nogma", f2trans="full")
    # Reference bug workaround for oracle purposes only: bind the missing args.
    orig_update = ref.corr_fn.update
    ref.corr_fn.update = lambda f1, f2, c1: orig_update(f1, f2, None, None, c1)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from craft_tpu.config import craft_nogma_config
    cfg = craft_nogma_config(mixed_precision=False)
    model = FlowModel(cfg=cfg, train=False)

    rng = np.random.RandomState(2)
    H, W = 128, 128
    img1 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img1),
                           jnp.asarray(img2), iters=1)
    variables, _ = convert_torch_state(state, variables, strict=True)
    lowres, flows = model.apply(variables, jnp.asarray(img1),
                                jnp.asarray(img2), iters=3)
    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
        _, ref_up = ref(t1, t2, iters=3, test_mode=1)
    err = np.abs(np.asarray(flows[-1])
                 - ref_up.numpy().transpose(0, 2, 3, 1)).max()
    assert err < 1e-4, f"nogma: max |flow diff| = {err}"
