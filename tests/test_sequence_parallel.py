"""Sequence-parallel attention over an 8-device CPU mesh must reproduce the
single-device kernels exactly."""

import numpy as np
import pytest


def _mesh():
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), axis_names=("data",))


def test_sp_fused_agg_corr(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import fused_agg_corr
    from craft_tpu.parallel.sequence_parallel import sp_fused_agg_corr

    mesh = _mesh()
    M, U, md = 4, 256, 16
    q = jnp.asarray(rng.randn(M, U, md).astype(np.float32))
    k = jnp.asarray(rng.randn(M, U, md).astype(np.float32))
    bias = jnp.asarray(rng.randn(U, U).astype(np.float32))

    want = np.asarray(fused_agg_corr(q, k, bias, 3.0, 0.5, 0.7, -0.2,
                                     tq=128, tk=128, interpret=True))
    got = np.asarray(sp_fused_agg_corr(mesh, q, k, bias, 3.0, 0.5, 0.7,
                                       -0.2, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sp_flash_attention(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import flash_mode_attention
    from craft_tpu.parallel.sequence_parallel import sp_flash_mode_attention

    mesh = _mesh()
    M, U, md, F = 2, 256, 16, 32
    q = jnp.asarray(rng.randn(M, U, md).astype(np.float32))
    k = jnp.asarray(rng.randn(M, U, md).astype(np.float32))
    v = jnp.asarray(rng.randn(M, U, F).astype(np.float32))
    bias = jnp.asarray(rng.randn(U, U).astype(np.float32))

    want = np.asarray(flash_mode_attention(q, k, v, bias, 4.0, 0.5,
                                           tq=128, tk=128, interpret=True))
    got = np.asarray(sp_flash_mode_attention(mesh, q, k, v, bias, 4.0, 0.5,
                                             interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)
