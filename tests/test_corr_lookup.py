"""The MXU-matmul corr lookup must match the gather lookup and the torch
reference bit-for-bit (modulo fp32 rounding)."""

import numpy as np
import pytest


def test_mxu_lookup_matches_gather(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.corr import (corr_lookup_gather, corr_lookup_mxu,
                                    plain_corr_pyramid)
    from craft_tpu.ops.geometry import coords_grid

    B, H, W, C = 2, 16, 20, 32
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))

    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-3, 3, (B, H, W, 2)).astype(np.float32))
    a = np.asarray(corr_lookup_gather(pyr, coords))
    b = np.asarray(corr_lookup_mxu(pyr, coords))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_mxu_lookup_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/core")
    from corr import CorrBlock

    import jax.numpy as jnp
    from craft_tpu.ops.corr import corr_lookup_mxu, plain_corr_pyramid
    from craft_tpu.ops.geometry import coords_grid

    B, H, W, C = 1, 16, 24, 16
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)

    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-2, 5, (B, H, W, 2)).astype(np.float32))
    got = np.asarray(corr_lookup_mxu(pyr, coords))

    tc = CorrBlock(torch.from_numpy(f1.transpose(0, 3, 1, 2)),
                   torch.from_numpy(f2.transpose(0, 3, 1, 2)), radius=4)
    tcoords = torch.from_numpy(np.asarray(coords).transpose(0, 3, 1, 2))
    want = tc(tcoords).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_window_lookup_matches_mxu(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.corr import (corr_lookup_mxu, corr_lookup_window,
                                    plain_corr_pyramid)
    from craft_tpu.ops.geometry import coords_grid

    B, H, W, C = 2, 16, 24, 16
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-6, 6, (B, H, W, 2)).astype(np.float32))
    a = np.asarray(corr_lookup_mxu(pyr, coords))
    b = np.asarray(corr_lookup_window(pyr, coords))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_lerp_lookup_matches_mxu(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.corr import (corr_lookup_lerp, corr_lookup_mxu,
                                    plain_corr_pyramid)
    from craft_tpu.ops.geometry import coords_grid

    B, H, W, C = 2, 16, 24, 16
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-8, 8, (B, H, W, 2)).astype(np.float32))
    a = np.asarray(corr_lookup_mxu(pyr, coords))
    b = np.asarray(corr_lookup_lerp(pyr, coords))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_packed_lookup_matches_mxu(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.corr import (corr_lookup_mxu, corr_lookup_packed,
                                    pack_pyramid, plain_corr_pyramid)
    from craft_tpu.ops.geometry import coords_grid

    B, H, W, C = 2, 16, 24, 16
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    pp = pack_pyramid(pyr)
    coords = coords_grid(B, H, W) + jnp.asarray(
        rng.uniform(-8, 8, (B, H, W, 2)).astype(np.float32))
    a = np.asarray(corr_lookup_mxu(pyr, coords))
    b = np.asarray(corr_lookup_packed(pp, coords))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_pallas_lookup_matches_gather(rng):
    """Fused Pallas lookup (interpret mode) vs the gather reference, D=1 and
    D=2, including out-of-range and boundary queries."""
    import jax.numpy as jnp
    from craft_tpu.ops.corr import (build_pyramid, corr_lookup_gather,
                                    plain_corr_pyramid)
    from craft_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

    B, H, W, C = 2, 16, 20, 32
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    coords = jnp.asarray(rng.uniform(-8, 28, (B, H, W, 2)).astype(np.float32))
    a = np.asarray(corr_lookup_gather(pyr, coords))
    b = np.asarray(corr_lookup_pallas(pyr, coords, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-4)

    U = 12 * 20
    corr = jnp.asarray(rng.randn(1, U, 2, U).astype(np.float32))
    pyr2 = build_pyramid(corr, 1, 12, 20, num_levels=3, radius=3)
    c2 = jnp.asarray(rng.uniform(-4, 24, (1, 12, 20, 2)).astype(np.float32))
    a2 = np.asarray(corr_lookup_gather(pyr2, c2))
    b2 = np.asarray(corr_lookup_pallas(pyr2, c2, interpret=True))
    np.testing.assert_allclose(a2, b2, atol=2e-4)


def test_pallas_lookup_grad_matches_mxu(rng):
    """corr_lookup_tpu's custom VJP (XLA backward) vs differentiating the
    mxu formulation directly."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.ops.corr import (CorrPyramid, corr_lookup_mxu,
                                    plain_corr_pyramid)
    from craft_tpu.ops.pallas.corr_lookup import corr_lookup_tpu

    B, H, W, C = 1, 8, 12, 16
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)
    pyr = plain_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3, 3)
    coords = jnp.asarray(rng.uniform(-2, 14, (B, H, W, 2)).astype(np.float32))

    def loss_pallas(levels):
        p = CorrPyramid(levels, B, H, W, 3, 1)
        return jnp.sum(jnp.sin(corr_lookup_tpu(p, coords, interpret=True)))

    def loss_mxu(levels):
        p = CorrPyramid(levels, B, H, W, 3, 1)
        return jnp.sum(jnp.sin(corr_lookup_mxu(p, coords)))

    gp = jax.grad(loss_pallas)(pyr.levels)
    gm = jax.grad(loss_mxu)(pyr.levels)
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
