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
        y = Conv(self.planes, (3, 3), (self.stride, self.stride), dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv1")(x)
        y = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(y)
        y = nn.relu(y)
        y = Conv(self.planes, (3, 3), dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv2")(y)
        y = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(y)
        y = nn.relu(y)

        if self.stride != 1:
            x = Conv(self.planes, (1, 1), (self.stride, self.stride),
                     dtype=self.dtype, kernel_init=kaiming_normal_fanout_init,
                     name="downsample")(x)
            x = make_norm(self.norm_fn, self.planes, self.train, self.dtype)(x)

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
        x = Conv(64, (7, 7), (2, 2), dtype=self.dtype,
                 kernel_init=kaiming_normal_fanout_init, name="conv1")(x)
        # Stem norm: 'group' here means GroupNorm(8 groups) (extractor.py:129-130).
        stem_norm = "group8" if self.norm_fn == "group" else self.norm_fn
        x = make_norm(stem_norm, 64, self.train, self.dtype)(x)
        x = nn.relu(x)

        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
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
