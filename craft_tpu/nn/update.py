"""Refinement update blocks (reference core/update.py:8-162).

SepConvGRU (1x5 then 5x1 gated passes), BasicMotionEncoder, FlowHead, and the
Basic/GMA update blocks.  These run once per refinement iteration inside the
model's lax.scan loop.  NHWC, bf16-capable.

TPU restructuring (numerics identical to the reference up to fp32-reduction
reassociation; parameter tree unchanged):

  * The z and r gate convs share the same [h, x] input, and each gate conv is
    linear over the channel split — conv([h, x]) = conv_h(h) + conv_x(x).
    Both passes therefore run as two merged convs: one over h producing the
    z|r gate halves (128 -> 256) and one over x producing the z|r|q thirds
    (Cx -> 384), instead of three 512 -> 128 convs.  Fewer passes over the
    inputs, wider MXU GEMMs (N=256/384 vs 128).
  * The context part of the GRU input (`inp`, reference update.py:153-156)
    is constant across the 12 refinement iterations, so its gate
    contribution is precomputed ONCE outside the lax.scan
    (SepConvGRU.static_contrib) — removing ~25% of the in-loop GRU MACs.
  * FlowHead.conv1 and the upsample-mask conv1 both read `net`
    (update.py:98-112); they run as one merged 128 -> 512 conv.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from craft_tpu.config import ModelConfig
from craft_tpu.nn.layers import Conv


def _conv2d(x, kernel, padding):
    """Plain NHWC conv with explicit symmetric padding (torch SAME parity)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class FlowHead(nn.Module):
    """conv3x3(128->256) -> ReLU -> conv3x3(256->2) (reference update.py:8-16)."""

    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, (3, 3), dtype=self.dtype, name="conv1")(x))
        return Conv(2, (3, 3), dtype=self.dtype, name="conv2")(x)


class ConvGRU(nn.Module):
    """Single 3x3 ConvGRU (reference update.py:19-34; defined for API
    completeness — the default models use SepConvGRU)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(self.hidden_dim, (3, 3), dtype=self.dtype,
                            name="convz")(hx))
        r = nn.sigmoid(Conv(self.hidden_dim, (3, 3), dtype=self.dtype,
                            name="convr")(hx))
        q = nn.tanh(Conv(self.hidden_dim, (3, 3), dtype=self.dtype,
                         name="convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """Separable ConvGRU: horizontal (1x5) then vertical (5x1) gated update
    (reference update.py:37-64).

    The gate math is the reference's exactly; execution is restructured for
    the MXU (see module docstring): per direction, one merged conv over h for
    the z|r halves, one merged conv over x for the z|r|q thirds, and the q
    conv over r*h.  When `static` (from static_contrib) is given, `x` holds
    only the channels that change per iteration and the precomputed
    contribution of the static channels is added instead.

    fused='on' routes both passes through the fused Pallas kernels
    (ops/pallas/sep_conv_gru.py): all three gate convs + the
    sigmoid/tanh/update chain in one kernel per direction.  Measured on this
    chip the fused path only TIES the XLA convs in isolation (65 vs 69 ms
    for 12 fwd+bwd at the chairs config) and LOSES inside the refinement
    scan (inference 17.9 vs 20.2 fps; train step 1.4 s vs 0.54 s) — an
    in-scan Pallas custom call cannot overlap with neighboring compute the
    way XLA's fused convs do, and the custom-VJP residuals bloat the scan.
    Kept OFF by default as a tested alternative (same negative-result
    pattern as the round-1 Pallas corr-lookup; see BENCH_NOTES.md).
    Parameters and math are identical (same flax Conv submodules own the
    weights)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32
    fused: str = "off"  # 'off' (default) | 'on' | 'auto' (TPU only)

    def setup(self):
        hd = self.hidden_dim
        self.convz_h = Conv(hd, (1, 5), dtype=self.dtype)
        self.convr_h = Conv(hd, (1, 5), dtype=self.dtype)
        self.convq_h = Conv(hd, (1, 5), dtype=self.dtype)
        self.convz_v = Conv(hd, (5, 1), dtype=self.dtype)
        self.convr_v = Conv(hd, (5, 1), dtype=self.dtype)
        self.convq_v = Conv(hd, (5, 1), dtype=self.dtype)

    def _gates(self, direction: str, cin: int):
        """Create (if needed) and fetch the three gate convs' weights for one
        direction.  The dummy calls only create the flax params (dead code
        under jit); the restructured math consumes the kernels directly."""
        mods = ((self.convz_h, self.convr_h, self.convq_h) if direction == "h"
                else (self.convz_v, self.convr_v, self.convq_v))
        out = []
        for conv in mods:
            conv(jnp.zeros((1, 1, 1, cin), self.dtype))
            p = conv.variables["params"]["Conv_0"]
            out.append((p["kernel"].astype(self.dtype),
                        p["bias"].astype(self.dtype)))
        return out

    @staticmethod
    def _padding(direction: str):
        return ((0, 0), (2, 2)) if direction == "h" else ((2, 2), (0, 0))

    def static_contrib(self, x_static: jnp.ndarray, dyn_channels: int):
        """Precompute the gate contributions of iteration-invariant input
        channels (the context features `inp`): one [B, H, W, 3*hidden] tensor
        per direction, consumed by __call__(static=...).  `dyn_channels` is
        the width of the per-iteration x so the full-width params can be
        created here (outside the scan)."""
        ch = self.hidden_dim
        cs = x_static.shape[-1]
        cin = ch + cs + dyn_channels
        x_static = x_static.astype(self.dtype)
        contrib = {"cs": cs}
        for d in ("h", "v"):
            (kz, _), (kr, _), (kq, _) = self._gates(d, cin)
            kxs = jnp.concatenate([k[:, :, ch:ch + cs, :]
                                   for k in (kz, kr, kq)], axis=-1)
            contrib[d] = _conv2d(x_static, kxs, self._padding(d))
        return contrib

    def __call__(self, h, x, static: Optional[dict] = None):
        from craft_tpu.ops.pallas.sep_conv_gru import (fused_gru_vmem_ok,
                                                       gru_pass)

        B, H, W, Ch = h.shape
        cs = static["cs"] if static is not None else 0
        Cx = cs + x.shape[-1]
        itemsize = jnp.dtype(self.dtype).itemsize
        interp = jax.default_backend() != "tpu"
        use_fused = (self.fused == "on"
                     or (self.fused == "auto" and not interp))
        fused = (use_fused and static is None
                 and fused_gru_vmem_ok(H * W, Ch, Cx, 1, itemsize))

        if fused:
            Cin = Ch + Cx

            def run_pass(h4, x4, name, width):
                # The vertical (5x1) pass runs on the transposed image, so
                # both directions use the stride-1 kernel (a 4-image-row
                # halo per tile would dwarf the tiles otherwise).
                parts = []
                for g in ("z", "r", "q"):
                    conv = getattr(self, f"conv{g}_{name}")
                    # Parameter-creating dummy call (dead code under jit);
                    # the kernel consumes the same weights tap-split.
                    conv(jnp.zeros((1, 1, 1, Cin), self.dtype))
                    p = conv.variables["params"]["Conv_0"]
                    taps = p["kernel"].reshape(5, Cin, self.hidden_dim)
                    parts.append((taps[:, :Ch, :], taps[:, Ch:, :],
                                  p["bias"]))
                (wzh, wzx, bz), (wrh, wrx, br), (wqh, wqx, bq) = parts
                rows = h4.shape[1] * h4.shape[2]
                out = gru_pass(h4.reshape(B, rows, Ch),
                               x4.reshape(B, rows, Cx),
                               wzh, wzx, wrh, wrx, wqh, wqx, bz, br, bq,
                               1, width, interp)
                return out.reshape(h4.shape)

            h = run_pass(h, x, "h", W)
            ht = run_pass(h.transpose(0, 2, 1, 3),
                          x.transpose(0, 2, 1, 3), "v", H)
            return ht.transpose(0, 2, 1, 3)

        hd = self.hidden_dim
        x = x.astype(self.dtype)
        for d in ("h", "v"):
            (kz, bz), (kr, br), (kq, bq) = self._gates(d, Ch + Cx)
            pad = self._padding(d)
            # Merged conv over the per-iteration x channels -> z|r|q thirds.
            kxd = jnp.concatenate([k[:, :, Ch + cs:, :]
                                   for k in (kz, kr, kq)], axis=-1)
            a = _conv2d(x, kxd, pad)
            if static is not None:
                a = a + static[d].astype(a.dtype)
            # Merged conv over h -> z|r halves.
            khzr = jnp.concatenate([kz[:, :, :Ch, :], kr[:, :, :Ch, :]],
                                   axis=-1)
            g = _conv2d(h.astype(self.dtype), khzr, pad)
            z = nn.sigmoid(g[..., :hd] + a[..., :hd] + bz)
            r = nn.sigmoid(g[..., hd:] + a[..., hd:2 * hd] + br)
            q = nn.tanh(_conv2d((r * h).astype(self.dtype),
                                kq[:, :, :Ch, :], pad)
                        + a[..., 2 * hd:] + bq)
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """Encode (corr window, flow) -> 126ch features + raw 2ch flow = 128ch
    (reference update.py:67-87)."""

    cor_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        cor = nn.relu(Conv(192, (3, 3), dtype=self.dtype, name="convc2")(cor))
        flo = nn.relu(Conv(128, (7, 7), dtype=self.dtype, name="convf1")(flow))
        flo = nn.relu(Conv(64, (3, 3), dtype=self.dtype, name="convf2")(flo))
        out = nn.relu(Conv(126, (3, 3), dtype=self.dtype, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class UpsampleMaskHead(nn.Module):
    """conv3x3(128->256) -> ReLU -> conv1x1(256->64*9), scaled x0.25
    (reference update.py:98-101, 112)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net):
        m = nn.relu(Conv(256, (3, 3), dtype=self.dtype, name="conv1")(net))
        m = Conv(64 * 9, (1, 1), dtype=self.dtype, name="conv2")(m)
        return 0.25 * m


def _merged_heads(flow_head: FlowHead, mask_head: UpsampleMaskHead, net,
                  dtype):
    """FlowHead + UpsampleMaskHead with their first 3x3 convs (both reading
    `net`) merged into one 128 -> 512 conv.  Same params, same math."""
    net = net.astype(dtype)
    flow_head(jnp.zeros((1, 1, 1, net.shape[-1]), dtype))  # param-creating
    mask_head(jnp.zeros((1, 1, 1, net.shape[-1]), dtype))  # dummy calls
    pf = flow_head.variables["params"]
    pm = mask_head.variables["params"]

    def kb(tree, name):
        p = tree[name]["Conv_0"]
        return p["kernel"].astype(dtype), p["bias"].astype(dtype)

    k1f, b1f = kb(pf, "conv1")
    k1m, b1m = kb(pm, "conv1")
    nf = k1f.shape[-1]
    y = nn.relu(_conv2d(net, jnp.concatenate([k1f, k1m], axis=-1),
                        ((1, 1), (1, 1)))
                + jnp.concatenate([b1f, b1m]))
    k2f, b2f = kb(pf, "conv2")
    k2m, b2m = kb(pm, "conv2")
    delta_flow = _conv2d(y[..., :nf], k2f, ((1, 1), (1, 1))) + b2f
    mask = 0.25 * (_conv2d(y[..., nf:], k2m, ((0, 0), (0, 0))) + b2m)
    return delta_flow, mask


class BasicUpdateBlock(nn.Module):
    """RAFT update block (reference update.py:90-113).

    `gru_static` (from precompute_gru_static, computed once outside the
    refinement scan) carries the context features' GRU gate contribution —
    `inp` is iteration-invariant so its convs need not run per step."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = BasicMotionEncoder(self.cfg.cor_planes, self.dtype)
        self.gru = SepConvGRU(self.cfg.hidden_dim, self.dtype)
        self.flow_head = FlowHead(256, self.dtype)
        self.mask = UpsampleMaskHead(self.dtype)

    def precompute_gru_static(self, inp):
        return self.gru.static_contrib(inp, dyn_channels=128)

    def upsample_mask(self, net):
        """Mask head alone — used by the eval-only final-iteration upsample
        (the per-iteration masks of test_mode=1 are dead work; see
        FlowModel.upsample_mode).  Same params as the merged path."""
        return self.mask(net.astype(self.dtype))

    def __call__(self, net, inp, corr, flow, gru_static=None):
        motion = self.encoder(flow, corr)
        if gru_static is None:
            net = self.gru(net, jnp.concatenate([inp, motion], axis=-1))
        else:
            net = self.gru(net, motion, static=gru_static)
        delta_flow, mask = _merged_heads(self.flow_head, self.mask, net,
                                         self.dtype)
        return net, mask, delta_flow


class GMAUpdateBlock(nn.Module):
    """GMA update block with global motion aggregation (reference update.py:116-162).

    The aggregator is either GMA `Aggregate` (single-mode attention [B,1,U,U]) or
    SETrans `ExpandedFeatTrans` (multi-mode probs [B,M,U,U]), chosen by
    cfg.use_setrans.  `attention` is precomputed outside the scan loop, and so
    is `gru_static` (the context features' GRU gate contribution).
    """

    cfg: ModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        from craft_tpu.nn.gma import Aggregate
        from craft_tpu.nn.setrans import ExpandedFeatTrans
        from craft_tpu.config import intra_aggregator_config

        self.encoder = BasicMotionEncoder(self.cfg.cor_planes, self.dtype)
        if self.cfg.use_setrans:
            self.aggregator = ExpandedFeatTrans(
                intra_aggregator_config(self.cfg.intra), dtype=self.dtype)
        else:
            self.aggregator = Aggregate(dim=128, heads=self.cfg.num_heads,
                                        dim_head=128, dtype=self.dtype)
        self.gru = SepConvGRU(self.cfg.hidden_dim, self.dtype)
        self.flow_head = FlowHead(256, self.dtype)
        self.mask = UpsampleMaskHead(self.dtype)

    def precompute_gru_static(self, inp):
        return self.gru.static_contrib(inp, dyn_channels=256)

    def upsample_mask(self, net):
        """Mask head alone (see BasicUpdateBlock.upsample_mask)."""
        return self.mask(net.astype(self.dtype))

    def __call__(self, net, inp, corr, flow, attention, gru_static=None):
        motion = self.encoder(flow, corr)
        B, H, W, C = motion.shape
        if self.cfg.use_setrans:
            motion_3d = motion.reshape(B, H * W, C)
            global_3d = self.aggregator(motion_3d, attention,
                                        deterministic=True)
            motion_global = global_3d.reshape(B, H, W, C)
        else:
            motion_global = self.aggregator(attention, motion)

        if gru_static is None:
            gru_in = jnp.concatenate([inp, motion, motion_global], axis=-1)
            net = self.gru(net, gru_in)
        else:
            net = self.gru(net, jnp.concatenate([motion, motion_global],
                                                axis=-1), static=gru_static)
        delta_flow, mask = _merged_heads(self.flow_head, self.mask, net,
                                         self.dtype)
        return net, mask, delta_flow
