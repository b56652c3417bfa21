"""Eval-mode BatchNorm->conv folding and InstanceNorm stats formulations
must be value-identical to the straightforward paths (round-5 serving
graph work: the fold deletes the conv->elementwise->conv layout breaks)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_bn_fold_matches_unfolded(rng):
    from craft_tpu.nn.encoder import BasicEncoder

    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32) * 50 + 100)
    enc_eval = BasicEncoder(output_dim=64, norm_fn="batch", train=False)
    variables = enc_eval.init(jax.random.PRNGKey(0), x)
    # Push the running stats away from init (mean 0 / var 1) so the fold
    # actually has something to fold.
    bs = jax.tree.map(lambda a: a, variables["batch_stats"])
    bs = jax.tree.map(
        lambda a: a + 0.3 if a.ndim else a,
        bs)
    variables = {"params": variables["params"], "batch_stats": bs}

    folded = enc_eval.apply(variables, x)

    # Reference arm: same params, fold bypassed.
    import craft_tpu.nn.encoder as enc_mod
    orig = enc_mod._conv_bn_folded
    enc_mod._conv_bn_folded = lambda conv, bn, h: bn(conv(h))
    try:
        unfolded = enc_eval.apply(variables, x)
    finally:
        enc_mod._conv_bn_folded = orig

    np.testing.assert_allclose(np.asarray(folded), np.asarray(unfolded),
                               atol=2e-4, rtol=2e-5)


def test_instance_norm_stats_variants(rng):
    from craft_tpu.nn.layers import InstanceNorm

    x = jnp.asarray(rng.randn(2, 17, 23, 32).astype(np.float32) * 3 + 1)
    outs = {}
    for s in ("dot", "dot2", "mean"):
        outs[s] = np.asarray(InstanceNorm(stats=s).apply({}, x))
    np.testing.assert_array_equal(outs["dot"], outs["dot2"])
    np.testing.assert_allclose(outs["dot"], outs["mean"], atol=1e-5)
