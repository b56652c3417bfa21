"""Correctness of the Pallas mode-attention kernels (interpret mode on CPU)
vs straight-line numpy/jnp reference math."""

import numpy as np
import pytest


def _ref_scores(q, k, clip_val, bias, pos_w):
    M, U1, md = q.shape
    s = np.einsum("mid,mjd->mij", q, k) / np.sqrt(md)
    s = np.clip(s, -clip_val, clip_val)
    if bias is not None:
        s = s + pos_w * bias[None]
    return s


def test_scores_global_max(rng):
    from craft_tpu.ops.pallas.mode_attention import scores_global_max
    import jax.numpy as jnp

    M, U, md = 2, 300, 32
    q = rng.randn(M, U, md).astype(np.float32)
    k = rng.randn(M, U, md).astype(np.float32)
    got = float(scores_global_max(jnp.asarray(q), jnp.asarray(k),
                                  1 / np.sqrt(md), tq=128, tk=128,
                                  interpret=True))
    want = (np.einsum("mid,mjd->mij", q, k) / np.sqrt(md)).max()
    assert abs(got - want) < 1e-4


def test_flash_mode_attention_matches_dense(rng):
    from craft_tpu.ops.pallas.mode_attention import flash_mode_attention
    import jax.numpy as jnp

    M, U, md, F = 2, 200, 32, 64
    q = rng.randn(M, U, md).astype(np.float32)
    k = rng.randn(M, U, md).astype(np.float32)
    v = rng.randn(M, U, F).astype(np.float32)
    bias = rng.randn(U, U).astype(np.float32)
    clip_val, pos_w = 4.0, 0.5

    got = np.asarray(flash_mode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        clip_val, pos_w, tq=128, tk=128, interpret=True))

    s = _ref_scores(q, k, clip_val, bias, pos_w)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("mij,mjf->mif", p, v)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_agg_corr_matches_dense(rng):
    from craft_tpu.ops.pallas.mode_attention import fused_agg_corr
    import jax.numpy as jnp

    M, U, md = 4, 180, 16
    q = rng.randn(M, U, md).astype(np.float32)
    k = rng.randn(M, U, md).astype(np.float32)
    bias = rng.randn(U, U).astype(np.float32)
    clip_val, pos_w = 3.0, 0.5
    agg_w, agg_b = 0.7, -0.2

    got = np.asarray(fused_agg_corr(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(bias), clip_val, pos_w,
        agg_w, agg_b, tq=128, tk=128, interpret=True))

    s = _ref_scores(q, k, clip_val, bias, pos_w)  # [M, U, U]
    logits = agg_w * s + agg_b
    w = np.exp(logits - logits.max(0, keepdims=True))
    w = w / w.sum(0, keepdims=True)
    want = (w * s).sum(0)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_flash_uneven_padding(rng):
    """Non-multiple-of-tile U must be handled via key masking."""
    from craft_tpu.ops.pallas.mode_attention import flash_mode_attention
    import jax.numpy as jnp

    M, U, md, F = 1, 150, 16, 32
    q = rng.randn(M, U, md).astype(np.float32)
    k = rng.randn(M, U, md).astype(np.float32)
    v = rng.randn(M, U, F).astype(np.float32)
    got = np.asarray(flash_mode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, 100.0, 0.5,
        tq=128, tk=128, interpret=True))
    s = np.einsum("mid,mjd->mij", q, k) / np.sqrt(md)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("mij,mjf->mif", p, v)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rowbias_table_matches_dense(rng):
    import jax.numpy as jnp
    from craft_tpu.nn.setrans import sliding_pos_biases
    from craft_tpu.ops.pallas.mode_attention import make_rowbias_table

    H8, W8, R = 5, 16, 3
    biases = rng.randn(2 * R + 1, 2 * R + 1).astype(np.float32)
    dense = np.asarray(sliding_pos_biases(jnp.asarray(biases), H8, W8))
    M = np.asarray(make_rowbias_table(jnp.asarray(biases), W8))
    # dense[(qi*W8+qj), (kh*W8+kw)] must equal M[kh-qi+R][qj, kw] (0 outside).
    for qi in range(H8):
        for kh in range(H8):
            d = kh - qi
            blk = dense[qi * W8:(qi + 1) * W8, kh * W8:(kh + 1) * W8]
            if abs(d) <= R:
                np.testing.assert_allclose(blk, M[d + R], atol=0)
            else:
                assert np.all(blk == 0)


def test_flash_mt_matches_dense_bias(rng):
    import jax.numpy as jnp
    from craft_tpu.nn.setrans import sliding_pos_biases
    from craft_tpu.ops.pallas.mode_attention import (flash_mode_attention,
                                                     flash_mode_attention_mt)

    H8, W8, R = 6, 32, 2
    U = H8 * W8
    M_, md, F = 2, 16, 32
    q = rng.randn(M_, U, md).astype(np.float32)
    k = rng.randn(M_, U, md).astype(np.float32)
    v = rng.randn(M_, U, F).astype(np.float32)
    biases = rng.randn(2 * R + 1, 2 * R + 1).astype(np.float32)
    dense = sliding_pos_biases(jnp.asarray(biases), H8, W8)

    want = np.asarray(flash_mode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), dense, 4.0, 0.5,
        tq=64, tk=64, interpret=True))
    got = np.asarray(flash_mode_attention_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(biases),
        (H8, W8), 4.0, 0.5, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_agg_corr_mt_matches_dense_bias(rng):
    import jax.numpy as jnp
    from craft_tpu.nn.setrans import sliding_pos_biases
    from craft_tpu.ops.pallas.mode_attention import (fused_agg_corr,
                                                     fused_agg_corr_mt)

    H8, W8, R = 5, 24, 3
    U = H8 * W8
    M_, md = 4, 16
    q = rng.randn(M_, U, md).astype(np.float32)
    k = rng.randn(M_, U, md).astype(np.float32)
    biases = rng.randn(2 * R + 1, 2 * R + 1).astype(np.float32)
    dense = sliding_pos_biases(jnp.asarray(biases), H8, W8)

    want = np.asarray(fused_agg_corr(
        jnp.asarray(q), jnp.asarray(k), dense, 3.0, 0.5, 0.7, -0.2,
        tq=64, tk=64, interpret=True))
    got = np.asarray(fused_agg_corr_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases), (H8, W8),
        3.0, 0.5, 0.7, -0.2, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_mode_softmax_probs_mt(rng):
    import jax.numpy as jnp
    from craft_tpu.nn.setrans import sliding_pos_biases
    from craft_tpu.ops.pallas.mode_attention import mode_softmax_probs_mt

    H8, W8, R = 4, 32, 2
    U = H8 * W8
    M_, md = 4, 8
    q = rng.randn(M_, U, md).astype(np.float32)
    k = rng.randn(M_, U, md).astype(np.float32)
    biases = rng.randn(2 * R + 1, 2 * R + 1).astype(np.float32)
    dense = np.asarray(sliding_pos_biases(jnp.asarray(biases), H8, W8))

    got = np.asarray(mode_softmax_probs_mt(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(biases), (H8, W8),
        2.0, 1.0, out_dtype=jnp.float32, interpret=True))

    s = np.einsum("mid,mjd->mij", q, k) / np.sqrt(md)
    s = np.clip(s, -2.0, 2.0) + dense[None]
    p = np.exp(s - s.max(-1, keepdims=True))
    want = p / p.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=2e-4)
