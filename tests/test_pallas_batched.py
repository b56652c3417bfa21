"""Batched Pallas kernel entry points: [B, M, ...] inputs ride the kernel
grid (one launch) and must match the per-sample 3D results exactly.
VERDICT r1 #3: batch in the Pallas grid instead of jax.vmap per sample."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _mk(rng, B, M, U, md):
    q = rng.randn(B, M, U, md).astype(np.float32)
    k = rng.randn(B, M, U, md).astype(np.float32)
    return q, k


def test_scores_global_max_batched(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import scores_global_max

    q, k = _mk(rng, 3, 2, 200, 32)
    got = float(scores_global_max(jnp.asarray(q), jnp.asarray(k),
                                  1 / np.sqrt(32), tq=128, tk=128,
                                  interpret=True))
    want = max(
        float(scores_global_max(jnp.asarray(q[b]), jnp.asarray(k[b]),
                                1 / np.sqrt(32), tq=128, tk=128,
                                interpret=True))
        for b in range(3))
    assert abs(got - want) < 1e-5


def test_flash_mode_attention_batched(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import flash_mode_attention

    B, M, U, md, F = 2, 2, 150, 32, 64
    q, k = _mk(rng, B, M, U, md)
    v = rng.randn(B, M, U, F).astype(np.float32)
    bias = rng.randn(U, U).astype(np.float32)

    got = np.asarray(flash_mode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        4.0, 0.5, tq=128, tk=128, interpret=True))
    assert got.shape == (B, M, U, F)
    for b in range(B):
        want = np.asarray(flash_mode_attention(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(v[b]),
            jnp.asarray(bias), 4.0, 0.5, tq=128, tk=128, interpret=True))
        np.testing.assert_allclose(got[b], want, atol=1e-6)


def test_flash_mt_batched(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import flash_mode_attention_mt

    B, M, H8, W8, md, F = 2, 2, 4, 32, 16, 32
    U = H8 * W8
    q, k = _mk(rng, B, M, U, md)
    v = rng.randn(B, M, U, F).astype(np.float32)
    biases = rng.randn(15, 15).astype(np.float32)

    got = np.asarray(flash_mode_attention_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(biases),
        (H8, W8), 4.0, 0.5, interpret=True))
    assert got.shape == (B, M, U, F)
    for b in range(B):
        want = np.asarray(flash_mode_attention_mt(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(v[b]),
            jnp.asarray(biases), (H8, W8), 4.0, 0.5, interpret=True))
        np.testing.assert_allclose(got[b], want, atol=1e-6)


def test_fused_agg_corr_batched(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import fused_agg_corr

    B, M, U, md = 2, 2, 130, 32
    q, k = _mk(rng, B, M, U, md)
    bias = rng.randn(U, U).astype(np.float32)

    got = np.asarray(fused_agg_corr(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(bias), 4.0, 0.5,
        1.2, 0.1, tq=128, tk=128, interpret=True))
    assert got.shape == (B, U, U)
    for b in range(B):
        want = np.asarray(fused_agg_corr(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(bias), 4.0,
            0.5, 1.2, 0.1, tq=128, tk=128, interpret=True))
        np.testing.assert_allclose(got[b], want, atol=1e-6)


def test_fused_agg_corr_mt_batched(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import fused_agg_corr_mt

    B, M, H8, W8, md = 2, 2, 4, 32, 16
    U = H8 * W8
    q, k = _mk(rng, B, M, U, md)
    biases = rng.randn(15, 15).astype(np.float32)

    got = np.asarray(fused_agg_corr_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases), (H8, W8),
        4.0, 0.5, 1.2, 0.1, interpret=True))
    assert got.shape == (B, U, U)
    for b in range(B):
        want = np.asarray(fused_agg_corr_mt(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(biases),
            (H8, W8), 4.0, 0.5, 1.2, 0.1, interpret=True))
        np.testing.assert_allclose(got[b], want, atol=1e-6)


def test_mode_softmax_probs_mt_batched(rng):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import mode_softmax_probs_mt

    B, M, H8, W8, md = 2, 2, 4, 32, 16
    U = H8 * W8
    q, k = _mk(rng, B, M, U, md)
    biases = rng.randn(15, 15).astype(np.float32)

    got = np.asarray(mode_softmax_probs_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases), (H8, W8),
        4.0, 0.5, out_dtype=jnp.float32, interpret=True))
    assert got.shape == (B, M, U, U)
    for b in range(B):
        want = np.asarray(mode_softmax_probs_mt(
            jnp.asarray(q[b]), jnp.asarray(k[b]), jnp.asarray(biases),
            (H8, W8), 4.0, 0.5, out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got[b], want, atol=1e-6)


def test_batched_corr_vjp_grads_match_per_sample(rng):
    """Gradients of the batched fused_agg_corr_diff == sum/stack of
    per-sample gradients."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.corr_vjp import fused_agg_corr_diff

    B, M, H8, W8, md = 2, 2, 4, 32, 8
    U = H8 * W8
    q, k = _mk(rng, B, M, U, md)
    biases = rng.randn(15, 15).astype(np.float32) * 0.1
    gw = rng.randn(B, U, U).astype(np.float32)

    def loss_b(qq, kk, bb):
        vol = fused_agg_corr_diff(qq, kk, bb, jnp.float32(4.0), 0.5,
                                  jnp.float32(1.2), jnp.float32(0.1),
                                  (H8, W8), True)
        return jnp.sum(vol * gw)

    def loss_s(qq, kk, bb):
        tot = 0.0
        for b in range(B):
            vol = fused_agg_corr_diff(qq[b], kk[b], bb, jnp.float32(4.0),
                                      0.5, jnp.float32(1.2), jnp.float32(0.1),
                                      (H8, W8), True)
            tot = tot + jnp.sum(vol * gw[b])
        return tot

    gb = jax.grad(loss_b, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k),
                                             jnp.asarray(biases))
    gs = jax.grad(loss_s, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k),
                                             jnp.asarray(biases))
    for a, b_ in zip(gb, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_lazy_intra_attention_matches_materialized(rng):
    """End-to-end: ExpandedFeatTrans fed a LazyModeAttention produces the
    same aggregate as the same module fed the materialized probs."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.config import intra_attn_config, intra_aggregator_config
    from craft_tpu.nn.setrans import (ExpandedFeatTrans, LazyModeAttention,
                                      sliding_pos_biases)

    H8, W8, B = 4, 32, 2
    U = H8 * W8
    site = intra_attn_config()
    agg_cfg = intra_aggregator_config(site)
    M, md = site.num_modes, site.mode_dim

    q = rng.randn(B, M, U, md).astype(np.float32)
    k = rng.randn(B, M, U, md).astype(np.float32)
    biases = (rng.randn(2 * site.pos_bias_radius + 1,
                        2 * site.pos_bias_radius + 1) * 0.1).astype(
        np.float32)
    motion = rng.randn(B, U, site.feat_dim).astype(np.float32)

    # Materialized probs (XLA math).
    s = np.einsum("bmid,bmjd->bmij", q, k) / np.sqrt(md)
    dense = np.asarray(sliding_pos_biases(jnp.asarray(biases), H8, W8))
    s = s + site.pos_code_weight * dense[None, None]
    p = np.exp(s - s.max(-1, keepdims=True))
    p = (p / p.sum(-1, keepdims=True)).astype(np.float32)

    lazy = LazyModeAttention(q=jnp.asarray(q), k=jnp.asarray(k),
                             biases=jnp.asarray(biases), H=H8, W=W8,
                             clip_val=jnp.float32(1e30),
                             pos_w=site.pos_code_weight)

    mod = ExpandedFeatTrans(agg_cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(motion),
                         jnp.asarray(p))
    out_mat = mod.apply(variables, jnp.asarray(motion), jnp.asarray(p))
    out_lazy = mod.apply(variables, jnp.asarray(motion), lazy)
    np.testing.assert_allclose(np.asarray(out_lazy), np.asarray(out_mat),
                               atol=5e-5, rtol=1e-4)


def test_mode_softmax_probs_quantized(rng):
    """int8 fixed-point probs (round(exp*127) + per-row 1/(127 l) scale)
    reconstruct the bf16/f32 probs to ~1/254 of the row max, and the
    dequantized aggregate matches within 1%.  Diffuse rows (uniform
    attention over U tokens) must survive — the failure mode of a fixed
    global scale."""
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.mode_attention import mode_softmax_probs_mt

    M, H8, W8, md = 2, 4, 128, 16
    U = H8 * W8
    q = rng.randn(M, U, md).astype(np.float32) * 0.3
    k = rng.randn(M, U, md).astype(np.float32) * 0.3
    q[1] = 0.0  # mode 1: perfectly diffuse rows (prob = 1/U each)
    biases = (rng.randn(15, 15) * 0.1).astype(np.float32)
    biases_z = np.zeros_like(biases)

    want = np.asarray(mode_softmax_probs_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases_z), (H8, W8),
        100.0, 0.0, out_dtype=jnp.float32, interpret=True))
    num, sc = mode_softmax_probs_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases_z), (H8, W8),
        100.0, 0.0, interpret=True, quantized=True)
    got = np.asarray(num).astype(np.float32) * np.asarray(sc)
    assert np.asarray(num).dtype == np.int8
    np.testing.assert_allclose(got, want, atol=1e-4)
    # Diffuse mode: every entry 1/U, exactly representable (exp = 1 -> 127).
    np.testing.assert_allclose(got[1], 1.0 / U, rtol=1e-5)
    # Row sums stay normalized to ~0.5%.
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=5e-3)


def test_fused_agg_corr_norm_matches_unfused(rng):
    """Two-sweep fused clamp+norm kernel == fused_agg_corr_mt followed by
    global layer-norm (per batch element)."""
    import jax.numpy as jnp
    from craft_tpu.ops.corr import global_layer_norm
    from craft_tpu.ops.pallas.mode_attention import (_fused_norm_tiles,
                                                     fused_agg_corr_mt,
                                                     fused_agg_corr_norm_mt)

    B, M, H8, W8, md = 2, 2, 6, 128, 16
    U = H8 * W8
    assert _fused_norm_tiles(H8, W8) is not None
    q = rng.randn(B, M, U, md).astype(np.float32) * 0.5
    k = rng.randn(B, M, U, md).astype(np.float32) * 0.5
    biases = (rng.randn(15, 15) * 0.1).astype(np.float32)

    for attn_clip in (100.0, 0.5):  # clamp predicate off / on
        got, stats = fused_agg_corr_norm_mt(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases), (H8, W8),
            attn_clip, 0.5, 1.2, 0.1, out_dtype=jnp.float32, interpret=True)

        gmax = float(np.max(np.einsum("bmid,bmjd->bmij", q, k)
                            / np.sqrt(md)))
        clip_val = attn_clip if gmax > attn_clip else 1e30
        raw = fused_agg_corr_mt(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases), (H8, W8),
            clip_val, 0.5, 1.2, 0.1, interpret=True)
        want = np.asarray(global_layer_norm(
            jnp.asarray(raw).reshape(B, 1, U * U)).reshape(B, U, U))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4,
                                   rtol=1e-3)
        # The clamp predicate is the batch-GLOBAL raw max (reference
        # setrans.py:521-529), reported identically for every sample.
        for b in range(B):
            np.testing.assert_allclose(float(np.asarray(stats)[b, 0, 0]),
                                       gmax, atol=1e-4)


def test_fused_agg_corr_norm_batch_global_clamp(rng):
    """One sample's raw scores exceed attn_clip, the other's do not: the
    fused kernel must clamp BOTH (batch-global predicate), matching the
    unfused scores_global_max + fused_agg_corr_mt path exactly."""
    import jax.numpy as jnp
    from craft_tpu.ops.corr import global_layer_norm
    from craft_tpu.ops.pallas.mode_attention import (_fused_norm_tiles,
                                                     fused_agg_corr_mt,
                                                     fused_agg_corr_norm_mt)

    B, M, H8, W8, md = 2, 2, 6, 128, 16
    U = H8 * W8
    assert _fused_norm_tiles(H8, W8) is not None
    q = rng.randn(B, M, U, md).astype(np.float32) * 0.1
    k = rng.randn(B, M, U, md).astype(np.float32) * 0.1
    # Push only sample 0 above the clip threshold.
    q[0, 0, 0] = 5.0
    k[0, 0, 0] = 5.0
    attn_clip = 10.0
    per_sample_max = [float(np.max(np.einsum("mid,mjd->mij", q[b], k[b])
                                   / np.sqrt(md))) for b in range(B)]
    assert per_sample_max[0] > attn_clip > per_sample_max[1]

    got, stats = fused_agg_corr_norm_mt(
        jnp.asarray(q), jnp.asarray(k),
        jnp.asarray((rng.randn(15, 15) * 0.1).astype(np.float32)), (H8, W8),
        attn_clip, 0.0, 1.2, 0.1, out_dtype=jnp.float32, interpret=True)
    raw = fused_agg_corr_mt(
        jnp.asarray(q), jnp.asarray(k),
        jnp.zeros((15, 15), np.float32), (H8, W8),
        attn_clip, 0.0, 1.2, 0.1, interpret=True)
    want = np.asarray(global_layer_norm(
        jnp.asarray(raw).reshape(B, 1, U * U)).reshape(B, U, U))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
    for b in range(B):
        np.testing.assert_allclose(float(np.asarray(stats)[b, 0, 0]),
                                   max(per_sample_max), atol=1e-4)
