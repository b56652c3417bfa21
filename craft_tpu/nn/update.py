"""Refinement update blocks (reference core/update.py:8-162).

SepConvGRU (1x5 then 5x1 gated passes), BasicMotionEncoder, FlowHead, and the
Basic/GMA update blocks.  These run once per refinement iteration inside the
model's lax.scan loop.  NHWC, bf16-capable.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from craft_tpu.config import ModelConfig
from craft_tpu.nn.layers import Conv


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

    @nn.compact
    def __call__(self, h, x):
        import jax

        from craft_tpu.ops.pallas.sep_conv_gru import (fused_gru_vmem_ok,
                                                       gru_pass)

        B, H, W, Ch = h.shape
        Cx = x.shape[-1]
        itemsize = jnp.dtype(self.dtype).itemsize
        interp = jax.default_backend() != "tpu"
        use_fused = (self.fused == "on"
                     or (self.fused == "auto" and not interp))
        fused = use_fused and fused_gru_vmem_ok(H * W, Ch, Cx, 1, itemsize)

        if fused:
            Cin = Ch + Cx

            def run_pass(h4, x4, name, width):
                # The vertical (5x1) pass runs on the transposed image, so
                # both directions use the stride-1 kernel (a 4-image-row
                # halo per tile would dwarf the tiles otherwise).
                parts = []
                for g in ("z", "r", "q"):
                    conv = Conv(self.hidden_dim, (1, 5) if name == "h"
                                else (5, 1), dtype=self.dtype,
                                name=f"conv{g}_{name}")
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

        for name, kernel in (("h", (1, 5)), ("v", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(Conv(self.hidden_dim, kernel, dtype=self.dtype,
                                name=f"convz_{name}")(hx))
            r = nn.sigmoid(Conv(self.hidden_dim, kernel, dtype=self.dtype,
                                name=f"convr_{name}")(hx))
            q = nn.tanh(Conv(self.hidden_dim, kernel, dtype=self.dtype,
                             name=f"convq_{name}")(
                jnp.concatenate([r * h, x], axis=-1)))
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


class BasicUpdateBlock(nn.Module):
    """RAFT update block (reference update.py:90-113)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.cfg.cor_planes, self.dtype,
                                    name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.cfg.hidden_dim, self.dtype, name="gru")(net, gru_in)
        delta_flow = FlowHead(256, self.dtype, name="flow_head")(net)
        mask = UpsampleMaskHead(self.dtype, name="mask")(net)
        return net, mask, delta_flow


class GMAUpdateBlock(nn.Module):
    """GMA update block with global motion aggregation (reference update.py:116-162).

    The aggregator is either GMA `Aggregate` (single-mode attention [B,1,U,U]) or
    SETrans `ExpandedFeatTrans` (multi-mode probs [B,M,U,U]), chosen by
    cfg.use_setrans.  `attention` is precomputed outside the scan loop.
    """

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        from craft_tpu.nn.gma import Aggregate
        from craft_tpu.nn.setrans import ExpandedFeatTrans
        from craft_tpu.config import intra_aggregator_config

        motion = BasicMotionEncoder(self.cfg.cor_planes, self.dtype,
                                    name="encoder")(flow, corr)
        B, H, W, C = motion.shape
        if self.cfg.use_setrans:
            motion_3d = motion.reshape(B, H * W, C)
            global_3d = ExpandedFeatTrans(
                intra_aggregator_config(self.cfg.intra), dtype=self.dtype,
                name="aggregator")(motion_3d, attention, deterministic=True)
            motion_global = global_3d.reshape(B, H, W, C)
        else:
            motion_global = Aggregate(dim=128, heads=self.cfg.num_heads,
                                      dim_head=128, dtype=self.dtype,
                                      name="aggregator")(attention, motion)

        gru_in = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(self.cfg.hidden_dim, self.dtype, name="gru")(net, gru_in)
        delta_flow = FlowHead(256, self.dtype, name="flow_head")(net)
        mask = UpsampleMaskHead(self.dtype, name="mask")(net)
        return net, mask, delta_flow
