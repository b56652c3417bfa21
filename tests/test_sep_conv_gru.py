"""Fused SepConvGRU Pallas pass vs the flax/XLA reference: forward parity
and gradient parity for both directional passes."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: interpret-mode kernels / full models (run with -m slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _ref_pass(h, x, wk, width, horizontal):
    """NHWC conv reference for one gated pass (matches SepConvGRU body)."""
    import jax
    import jax.numpy as jnp

    B, HW, Ch = h.shape
    H = HW // width
    h4 = h.reshape(B, H, width, Ch)
    x4 = x.reshape(B, H, width, -1)

    def conv(inp, w, b):
        kh, kw = (1, 5) if horizontal else (5, 1)
        k = w.reshape(kh, kw, inp.shape[-1], Ch)
        out = jax.lax.conv_general_dilated(
            inp, k, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out + b

    wz, wr, wq, bz, br, bq = wk
    hx = jnp.concatenate([h4, x4], axis=-1)
    z = jax.nn.sigmoid(conv(hx, wz, bz))
    r = jax.nn.sigmoid(conv(hx, wr, br))
    q = jnp.tanh(conv(jnp.concatenate([r * h4, x4], axis=-1), wq, bq))
    out = (1 - z) * h4 + z * q
    return out.reshape(B, HW, Ch)


def _mk(rng, B, H, W, Ch, Cx):
    h = rng.randn(B, H * W, Ch).astype(np.float32) * 0.5
    x = rng.randn(B, H * W, Cx).astype(np.float32) * 0.5
    Cin = Ch + Cx
    ws = []
    for _ in range(3):
        ws.append((rng.randn(5, Cin, Ch) * 0.05).astype(np.float32))
    bs = [(rng.randn(Ch) * 0.1).astype(np.float32) for _ in range(3)]
    return h, x, ws, bs


def _split(w, Ch):
    return w[:, :Ch, :], w[:, Ch:, :]


@pytest.mark.parametrize("horizontal", [True, False])
def test_gru_pass_forward_parity(rng, horizontal):
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.sep_conv_gru import gru_pass

    B, H, W, Ch, Cx = 2, 6, 11, 16, 24
    h, x, (wz, wr, wq), (bz, br, bq) = _mk(rng, B, H, W, Ch, Cx)
    stride = 1 if horizontal else W

    wzh, wzx = _split(wz, Ch)
    wrh, wrx = _split(wr, Ch)
    wqh, wqx = _split(wq, Ch)
    got = np.asarray(gru_pass(
        jnp.asarray(h), jnp.asarray(x), jnp.asarray(wzh), jnp.asarray(wzx),
        jnp.asarray(wrh), jnp.asarray(wrx), jnp.asarray(wqh),
        jnp.asarray(wqx), jnp.asarray(bz), jnp.asarray(br), jnp.asarray(bq),
        stride, W, True))

    want = np.asarray(_ref_pass(jnp.asarray(h), jnp.asarray(x),
                                (jnp.asarray(wz), jnp.asarray(wr),
                                 jnp.asarray(wq), jnp.asarray(bz),
                                 jnp.asarray(br), jnp.asarray(bq)),
                                W, horizontal))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("horizontal", [True, False])
def test_gru_pass_grad_parity(rng, horizontal):
    import jax
    import jax.numpy as jnp
    from craft_tpu.ops.pallas.sep_conv_gru import gru_pass

    B, H, W, Ch, Cx = 2, 5, 9, 8, 16
    h, x, (wz, wr, wq), (bz, br, bq) = _mk(rng, B, H, W, Ch, Cx)
    gw = rng.randn(B, H * W, Ch).astype(np.float32)
    stride = 1 if horizontal else W
    wzh, wzx = _split(wz, Ch)
    wrh, wrx = _split(wr, Ch)
    wqh, wqx = _split(wq, Ch)

    args = [jnp.asarray(a) for a in
            (h, x, wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq)]

    def loss_pallas(*a):
        return jnp.sum(gru_pass(*a, stride, W, True) * gw)

    def loss_ref(h_, x_, wzh_, wzx_, wrh_, wrx_, wqh_, wqx_, bz_, br_, bq_):
        wz_ = jnp.concatenate([wzh_, wzx_], axis=1)
        wr_ = jnp.concatenate([wrh_, wrx_], axis=1)
        wq_ = jnp.concatenate([wqh_, wqx_], axis=1)
        return jnp.sum(_ref_pass(h_, x_, (wz_, wr_, wq_, bz_, br_, bq_),
                                 W, horizontal) * gw)

    gp = jax.grad(loss_pallas, argnums=tuple(range(11)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(11)))(*args)
    names = ["h", "x", "wzh", "wzx", "wrh", "wrx", "wqh", "wqx",
             "bz", "br", "bq"]
    for n, a, b in zip(names, gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=n)


def test_sep_conv_gru_module_fused_matches_xla(rng):
    """Full SepConvGRU module: fused Pallas path (transposed vertical pass)
    == the XLA conv path, same parameters."""
    import jax
    import jax.numpy as jnp
    from craft_tpu.nn.update import SepConvGRU

    B, H, W, Ch, Cx = 2, 7, 10, 16, 24
    h = jnp.asarray(rng.randn(B, H, W, Ch).astype(np.float32) * 0.5)
    x = jnp.asarray(rng.randn(B, H, W, Cx).astype(np.float32) * 0.5)

    ref_mod = SepConvGRU(hidden_dim=Ch, fused="off")
    variables = ref_mod.init(jax.random.PRNGKey(3), h, x)
    want = ref_mod.apply(variables, h, x)

    fused_mod = SepConvGRU(hidden_dim=Ch, fused="on")
    got = fused_mod.apply(variables, h, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)

    # Gradient parity through the module.
    def loss(mod):
        def f(v, h_, x_):
            return jnp.sum(mod.apply(v, h_, x_) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(variables, h, x)

    gw, gh, gx = loss(ref_mod)
    fw, fh, fx = loss(fused_mod)
    np.testing.assert_allclose(np.asarray(fh), np.asarray(gh), atol=3e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(gx), atol=3e-4,
                               rtol=1e-3)
    flat_g = jax.tree.leaves(gw)
    flat_f = jax.tree.leaves(fw)
    for a, b in zip(flat_f, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=1e-3)
