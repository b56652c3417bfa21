"""upsample_mode='final' (eval-only final-iteration upsampling) must be
bit-identical to the default 'all' path's last field, with an unchanged
parameter tree (same FlowHead/UpsampleMaskHead submodules are used; see
models/flow_model.py docstring — the reference computes the dead
per-iteration masks eagerly, network.py:234-246)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _small_craft_cfg():
    from craft_tpu.config import craft_config
    return craft_config(mixed_precision=False)


@pytest.mark.parametrize("arch", ["craft", "raft"])
def test_final_matches_all(arch, rng):
    from craft_tpu.config import craft_config, raft_config
    from craft_tpu.models.flow_model import FlowModel

    cfg = craft_config() if arch == "craft" else raft_config()
    model = FlowModel(cfg=cfg, train=False)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img1, img2, iters=1)

    low_all, flows_all = jax.jit(
        lambda v: model.apply(v, img1, img2, iters=4))(variables)
    low_fin, flows_fin = jax.jit(
        lambda v: model.apply(v, img1, img2, iters=4,
                              upsample_mode="final"))(variables)

    assert flows_fin.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(low_all), np.asarray(low_fin))
    np.testing.assert_allclose(np.asarray(flows_all[-1]),
                               np.asarray(flows_fin[0]),
                               rtol=0, atol=1e-5)


def test_param_tree_identical(rng):
    from craft_tpu.models.flow_model import FlowModel

    cfg = _small_craft_cfg()
    model = FlowModel(cfg=cfg, train=False)
    img = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    v_all = model.init(jax.random.PRNGKey(0), img, img, iters=1)
    v_fin = model.init(jax.random.PRNGKey(0), img, img, iters=1,
                       upsample_mode="final")
    paths_all = set(jax.tree_util.tree_flatten_with_path(v_all)[0][i][0]
                    for i in range(len(jax.tree_util.tree_leaves(v_all))))
    paths_fin = set(jax.tree_util.tree_flatten_with_path(v_fin)[0][i][0]
                    for i in range(len(jax.tree_util.tree_leaves(v_fin))))
    assert paths_all == paths_fin
    for (pa, la), (pf, lf) in zip(
            jax.tree_util.tree_flatten_with_path(v_all)[0],
            jax.tree_util.tree_flatten_with_path(v_fin)[0]):
        assert pa == pf and la.shape == lf.shape


def test_packed_matches_all(rng):
    """upsample_mode='packed' is the 'all' math without the in-scan pixel
    shuffle: unpack_upsampled(packed) must equal 'all' bitwise."""
    from craft_tpu.models.flow_model import FlowModel
    from craft_tpu.ops.geometry import unpack_upsampled

    cfg = _small_craft_cfg()
    model = FlowModel(cfg=cfg, train=False)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img1, img2, iters=1)

    low_all, flows_all = jax.jit(
        lambda v: model.apply(v, img1, img2, iters=3))(variables)
    low_p, flows_p = jax.jit(
        lambda v: model.apply(v, img1, img2, iters=3,
                              upsample_mode="packed"))(variables)

    assert flows_p.shape == (3, 1, 8, 12, 128)
    np.testing.assert_array_equal(np.asarray(low_all), np.asarray(low_p))
    unpacked = jax.vmap(unpack_upsampled)(flows_p)
    np.testing.assert_allclose(np.asarray(flows_all), np.asarray(unpacked),
                               rtol=0, atol=1e-6)


def test_sequence_loss_packed_matches(rng):
    """sequence_loss_packed(pack(preds)) == sequence_loss(preds) up to
    reduction reordering."""
    from craft_tpu.ops.geometry import pack_fullres
    from craft_tpu.training.loss import sequence_loss, sequence_loss_packed

    iters, B, H, W = 3, 2, 16, 24
    preds = jnp.asarray(rng.randn(iters, B, H, W, 2).astype(np.float32) * 3)
    gt = jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32) * 3)
    valid = jnp.asarray((rng.rand(B, H, W) > 0.3).astype(np.float32))
    # A few huge-magnitude gt pixels exercise the MAX_FLOW cutoff.
    gt = gt.at[0, 0, 0].set(jnp.asarray([500.0, 10.0]))

    loss_ref, m_ref = sequence_loss(preds, gt, valid, gamma=0.8)
    packed = jax.vmap(lambda p: pack_fullres(p, 8))(preds)
    loss_p, m_p = sequence_loss_packed(packed, gt, valid, gamma=0.8)

    np.testing.assert_allclose(float(loss_p), float(loss_ref), rtol=1e-6)
    for k in m_ref:
        np.testing.assert_allclose(float(m_p[k]), float(m_ref[k]), rtol=1e-5,
                                   err_msg=k)
