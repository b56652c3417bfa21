"""Training-side flash attention for the f2/intra sites: forward + gradient
correctness of the Pallas-forward/XLA-backward softmax probs
(ops/pallas/probs_vjp.py) against plain XLA autodiff of the same math
(reference semantics: setrans.py:514-561 — clamp BEFORE bias, batch-global
conditional predicate)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


def _ref_probs(q, k, bias_dense, clip_val, pos_w):
    import jax
    import jax.numpy as jnp

    md = q.shape[-1]
    c = jnp.einsum("...mid,...mjd->...mij", q, k) / np.sqrt(md)
    s = jnp.clip(c, -clip_val, clip_val)
    s = s + pos_w * bias_dense
    return jax.nn.softmax(s, axis=-1)


@pytest.mark.parametrize("clip_val", [2.0, 1e30])
def test_dense_probs_vjp_matches_xla(rng, clip_val):
    """Dense-bias kernel (the non-mt-aligned fallback, e.g. W8=62 training
    crops): value + grads vs XLA autodiff at f32."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.probs_vjp import mode_softmax_probs_diff

    B, M, md = 2, 2, 16
    U = 60  # deliberately not a multiple of the kernel tiles
    q = jnp.asarray(rng.randn(B, M, U, md).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, U, md).astype(np.float32))
    bias = jnp.asarray(rng.randn(U, U).astype(np.float32) * 0.1)
    gw = jnp.asarray(rng.randn(B, M, U, U).astype(np.float32))
    pos_w = jnp.float32(0.5)
    cv = jnp.float32(clip_val)

    def loss_pallas(q, k, bias, pos_w):
        p = mode_softmax_probs_diff(q, k, bias, cv, pos_w, (0, 0), False,
                                    True, jnp.float32, jnp.float32)
        return jnp.sum(p * gw)

    def loss_xla(q, k, bias, pos_w):
        return jnp.sum(_ref_probs(q, k, bias, cv, pos_w) * gw)

    val_p, grads_p = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3))(
        q, k, bias, pos_w)
    val_x, grads_x = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3))(
        q, k, bias, pos_w)

    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-4)
    for name, gp, gx in zip(["dq", "dk", "dbias", "dpos_w"], grads_p, grads_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_structured_probs_vjp_matches_xla(rng):
    """Block-Toeplitz (mt) kernel on an aligned grid: value + grads incl. the
    sliding-window bias gradient."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.nn.setrans import sliding_pos_biases
    from craft_tpu.ops.pallas.probs_vjp import mode_softmax_probs_diff

    H8, W8, R = 8, 16, 2
    U = H8 * W8
    B, M, md = 1, 2, 16
    q = jnp.asarray(rng.randn(B, M, U, md).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, U, md).astype(np.float32))
    biases = jnp.asarray(rng.randn(2 * R + 1, 2 * R + 1).astype(np.float32))
    gw = jnp.asarray(rng.randn(B, M, U, U).astype(np.float32))
    cv = jnp.float32(1.5)  # active clamping
    pos_w = jnp.float32(0.5)

    def loss_pallas(q, k, biases, pos_w):
        p = mode_softmax_probs_diff(q, k, biases, cv, pos_w, (H8, W8), True,
                                    True, jnp.float32, jnp.float32)
        return jnp.sum(p * gw)

    def loss_xla(q, k, biases, pos_w):
        dense = sliding_pos_biases(biases, H8, W8)
        return jnp.sum(_ref_probs(q, k, dense, cv, pos_w) * gw)

    val_p, grads_p = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3))(
        q, k, biases, pos_w)
    val_x, grads_x = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3))(
        q, k, biases, pos_w)

    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-4)
    for name, gp, gx in zip(["dq", "dk", "dbias", "dpos_w"], grads_p, grads_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_module_train_path_takes_probs_kernel(rng):
    """CrossAttFeatTrans under bf16 training with use_pallas='on' takes the
    probs_vjp path and matches the XLA path (use_pallas='off') within bf16
    tolerance — forward AND parameter gradients."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from craft_tpu.config import intra_attn_config
    from craft_tpu.nn.setrans import SelfAttVisPosTrans

    H8, W8 = 8, 16
    x = jnp.asarray(rng.randn(1, H8, W8, 64).astype(np.float32) * 0.5)

    outs, grads = {}, {}
    for mode in ["on", "off"]:
        cfg = dataclasses.replace(
            intra_attn_config(num_modes=2),
            in_feat_dim=64, feat_dim=64,
            use_pallas=mode, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0)
        mod = SelfAttVisPosTrans(cfg, dtype=jnp.bfloat16)
        variables = mod.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, False)

        def loss(v):
            out = mod.apply(v, x, False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        outs[mode], grads[mode] = jax.value_and_grad(loss)(variables)

    np.testing.assert_allclose(float(outs["on"]), float(outs["off"]),
                               rtol=2e-2)
    flat_on = jax.tree_util.tree_leaves_with_path(grads["on"])
    flat_off = {jax.tree_util.keystr(p): g for p, g in
                jax.tree_util.tree_leaves_with_path(grads["off"])}
    for path, g_on in flat_on:
        g_off = flat_off[jax.tree_util.keystr(path)]
        scale = max(1e-3, float(jnp.max(jnp.abs(g_off))))
        np.testing.assert_allclose(
            np.asarray(g_on, np.float32), np.asarray(g_off, np.float32),
            atol=0.05 * scale, rtol=0.05,
            err_msg=jax.tree_util.keystr(path))
