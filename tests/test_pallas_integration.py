"""Integrated Pallas fast path vs XLA reference path (interpret mode, CPU):
the full CRAFT forward must produce identical flows either way."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def test_craft_pallas_path_matches_xla(rng):
    import jax
    import jax.numpy as jnp

    from craft_tpu.config import craft_config
    from craft_tpu.models.flow_model import FlowModel

    cfg_off = craft_config(mixed_precision=False)
    cfg_off = cfg_off.replace(
        inter=dataclasses.replace(cfg_off.inter, use_pallas="off"),
        f2=dataclasses.replace(cfg_off.f2, use_pallas="off"),
        intra=dataclasses.replace(cfg_off.intra, use_pallas="off"))
    cfg_on = cfg_off.replace(
        inter=dataclasses.replace(cfg_off.inter, use_pallas="on"),
        f2=dataclasses.replace(cfg_off.f2, use_pallas="on"),
        intra=dataclasses.replace(cfg_off.intra, use_pallas="on"))

    H, W = 64, 64
    img1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    model_off = FlowModel(cfg=cfg_off, train=False)
    variables = model_off.init(jax.random.PRNGKey(0), img1, img2, iters=1)
    low_off, flows_off = model_off.apply(variables, img1, img2, iters=2)

    model_on = FlowModel(cfg=cfg_on, train=False)
    low_on, flows_on = model_on.apply(variables, img1, img2, iters=2)

    np.testing.assert_allclose(np.asarray(flows_on[-1]),
                               np.asarray(flows_off[-1]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(low_on), np.asarray(low_off),
                               atol=5e-3)


def test_craft_fused_norm_path_matches_unfused(rng):
    """Full CRAFT forward with the fused clamp+norm correlation kernel
    (mixed precision, W8 % 128 == 0) vs the unfused Pallas path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from craft_tpu.config import craft_config
    from craft_tpu.models.flow_model import FlowModel

    cfg_on = craft_config(mixed_precision=True)
    cfg_on = cfg_on.replace(
        inter=dataclasses.replace(cfg_on.inter, use_pallas="on"),
        f2=dataclasses.replace(cfg_on.f2, use_pallas="on"),
        intra=dataclasses.replace(cfg_on.intra, use_pallas="on"))

    H, W = 16, 1024  # W8 = 128: fused-norm tiling applies; B=2 gates it on
    img1 = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32))

    model = FlowModel(cfg=cfg_on, train=False)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, iters=1)
    low_on, flows_on = model.apply(variables, img1, img2, iters=2)

    # The unfused reference: identical config except the fused kernel is
    # suppressed by disabling mixed precision only for the pyramid gate —
    # emulate by running with intermediates mutable (forces the raw path).
    (low_off, flows_off), _ = model.apply(variables, img1, img2, iters=2,
                                          mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(flows_on[-1]),
                               np.asarray(flows_off[-1]), atol=5e-2)
    np.testing.assert_allclose(np.asarray(low_on), np.asarray(low_off),
                               atol=5e-2)
