"""Feature / context encoders (reference core/extractor.py:6-196).

BasicEncoder: 7x7 stride-2 stem -> three 2-block residual stages (64, 96, 128 at
strides 1, 2, 2) -> 1x1 output conv; overall stride 8.  NHWC, bf16 compute with
fp32 params when mixed precision is on.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from craft_tpu.nn.layers import Conv, kaiming_normal_fanout_init, make_norm

# Reference encoder widths (extractor.py:124-196).  Module-level so
# experiments (tools/bench_norm_cost.py) can patch them.
STEM_DIM = 64
STAGE_DIMS = ((64, 1), (96, 2), (128, 2))


def _conv_bn_folded(conv: Conv, bn, x):
    """Conv + eval-mode BatchNorm with the static per-channel affine FOLDED
    into the conv weights (reference eval/freeze_bn runs BN on running
    averages, extractor.py:16-38 + network.py freeze_bn — a constant
    scale/shift per channel).  Applying it as a separate elementwise op
    breaks the conv->conv chain and makes XLA relayout-copy the activation
    between every cnet conv pair (the copy.9xx family in the round-5 HLO
    dump); folding deletes the break:  W' = W * g,  b' = (b - mean) * g +
    beta,  g = gamma / sqrt(var + eps).  Exact up to fp reassociation.

    Both modules are still created (dummy calls, dead under jit) so the
    parameter/batch_stats trees are bit-identical to the unfolded path —
    checkpoints are interchangeable."""
    import jax

    dtype = conv.dtype
    cin = x.shape[-1]
    conv(jnp.zeros((1, 1, 1, cin), dtype))
    bn(jnp.zeros((1, 1, 1, conv.features), dtype))
    p = conv.variables["params"]["Conv_0"]
    kernel, bias = p["kernel"], p.get("bias", None)
    gamma = bn.variables["params"]["scale"]
    beta = bn.variables["params"]["bias"]
    mean = bn.variables["batch_stats"]["mean"]
    var = bn.variables["batch_stats"]["var"]

    g = gamma * jax.lax.rsqrt(var + bn.epsilon)          # [C_out] fp32
    kernel_f = (kernel * g[None, None, None, :]).astype(dtype)
    b0 = bias if bias is not None else 0.0
    bias_f = ((b0 - mean) * g + beta).astype(dtype)

    kh, kw = conv.kernel
    if conv.padding == "SAME_TORCH":
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    elif conv.padding == "VALID":
        padding = ((0, 0), (0, 0))
    else:
        padding = conv.padding
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel_f, window_strides=tuple(conv.stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=conv.groups)
    return y + bias_f


class ResidualBlock(nn.Module):
    """Two 3x3 convs with norm + ReLU and an optional strided 1x1 downsample
    (reference extractor.py:6-64)."""

    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        fold = self.norm_fn == "batch" and not self.train

        def conv_norm(h, kernel, stride, name):
            conv = Conv(self.planes, kernel, stride, dtype=self.dtype,
                        kernel_init=kaiming_normal_fanout_init, name=name)
            norm = make_norm(self.norm_fn, self.planes, self.train,
                             self.dtype)
            if fold:
                return _conv_bn_folded(conv, norm, h)
            return norm(conv(h))

        y = conv_norm(x, (3, 3), (self.stride, self.stride), "conv1")
        y = nn.relu(y)
        y = conv_norm(y, (3, 3), (1, 1), "conv2")
        y = nn.relu(y)

        if self.stride != 1:
            x = conv_norm(x, (1, 1), (self.stride, self.stride),
                          "downsample")

        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1-3-1 bottleneck residual unit (reference extractor.py:67-122; defined
    by the reference but unused by its encoders — provided for API parity)."""

    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        p4 = self.planes // 4
        y = Conv(p4, (1, 1), padding="VALID", dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv1")(x)
        y = make_norm(self.norm_fn, p4, self.train, self.dtype)(y)
        y = nn.relu(y)
        y = Conv(p4, (3, 3), (self.stride, self.stride), dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv2")(y)
        y = make_norm(self.norm_fn, p4, self.train, self.dtype)(y)
        y = nn.relu(y)
        y = Conv(self.planes, (1, 1), padding="VALID", dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv3")(y)
        y = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(y)
        y = nn.relu(y)
        if self.stride != 1:
            x = Conv(self.planes, (1, 1), (self.stride, self.stride),
                     dtype=self.dtype, kernel_init=kaiming_normal_fanout_init,
                     name="downsample")(x)
            x = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 encoder (reference extractor.py:124-196).

    fnet: output_dim=256, norm 'instance'; cnet: output_dim=256, norm 'batch'
    (reference network.py:64-65).  Dropout2d applies per-channel at train time.
    """

    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        conv1 = Conv(STEM_DIM, (7, 7), (2, 2), dtype=self.dtype,
                     kernel_init=kaiming_normal_fanout_init, name="conv1")
        # Stem norm: 'group' here means GroupNorm(8 groups) (extractor.py:129-130).
        stem_norm = "group8" if self.norm_fn == "group" else self.norm_fn
        norm1 = make_norm(stem_norm, STEM_DIM, self.train, self.dtype)
        if stem_norm == "batch" and not self.train:
            x = _conv_bn_folded(conv1, norm1, x)
        else:
            x = norm1(conv1(x))
        x = nn.relu(x)

        for i, (dim, stride) in enumerate(STAGE_DIMS):
            x = ResidualBlock(dim, self.norm_fn, stride, self.dtype, self.train,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, self.dtype, self.train,
                              name=f"layer{i + 1}_1")(x)

        x = Conv(self.output_dim, (1, 1), dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv2")(x)

        if self.dropout > 0 and self.train:
            # torch Dropout2d zeroes whole channels per sample.
            import jax
            keep = 1.0 - self.dropout
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
            x = x * mask.astype(x.dtype) / keep
        return x
