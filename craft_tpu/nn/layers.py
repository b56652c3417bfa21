"""Shared layer utilities: initializers with torch-parity statistics, norms.

The reference relies on torch default inits (kaiming-uniform a=sqrt(5)) everywhere
except the encoders (kaiming-normal fan_out; extractor.py:156-163) and the SETrans
stack (normal 0.02; setrans.py:163-189).  Training-from-scratch parity needs the
same init distributions, so we reproduce them here for flax.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _conv_fan_in(shape: Sequence[int]) -> int:
    # flax conv kernel: (kh, kw, in, out); linear kernel: (in, out).
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return shape[-2] * receptive


def _conv_fan_out(shape: Sequence[int]) -> int:
    receptive = 1
    for d in shape[:-2]:
        receptive *= d
    return shape[-1] * receptive


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(_conv_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_default_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal_fanout_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu')."""
    std = math.sqrt(2.0 / _conv_fan_out(shape))
    return std * jax.random.normal(key, shape, dtype)


def normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Conv(nn.Module):
    """2D conv on NHWC with torch-default init and optional encoder-style init."""

    features: int
    kernel: Sequence[int] = (3, 3)
    stride: Sequence[int] = (1, 1)
    padding: Any = "SAME_TORCH"  # symmetric padding matching torch padding=k//2
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Any = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel
        if self.padding == "SAME_TORCH":
            padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        elif self.padding == "VALID":
            padding = ((0, 0), (0, 0))
        else:
            padding = self.padding
        fan_in = (in_features // self.groups) * kh * kw
        kinit = self.kernel_init or torch_default_kernel_init
        return nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=tuple(self.stride),
            padding=padding,
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=kinit,
            bias_init=make_torch_default_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    """Linear layer with torch-default or custom init."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_default_kernel_init
        binit = self.bias_init or make_torch_default_bias_init(in_features)
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def lean_dropout(x, rate: float, rng):
    """Memory-lean dropout for huge tensors (the [B, M, U, U] attention
    probs): hardware RNG bits compared against an integer threshold.  The
    standard threefry uniform-float path materializes ~6 full-size u32/f32
    temporaries (counter iota + hash rounds + conversions), which OOMs
    training at Sintel-scale attention sizes; `rng_bit_generator` produces
    the bits tensor directly on TPU.
    """
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    thresh = jnp.uint32(min(int(keep * (2 ** 32)), 2 ** 32 - 1))
    data = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    state = jnp.tile(data, 4)[:4]
    _, bits = jax.lax.rng_bit_generator(state, x.shape, dtype=jnp.uint32)
    return jnp.where(bits < thresh, x / keep, jnp.zeros((), x.dtype))


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False, track_running_stats=False) parity.

    Per-sample, per-channel normalization over spatial dims.  NHWC.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    stats: str = "dot"  # 'dot' (MXU moments, layout-neutral) | 'mean'

    @nn.compact
    def __call__(self, x):
        # Stats via E[x^2] - E[x]^2 with fp32 ACCUMULATORS but no
        # materialized fp32 copy of x: the two-pass (x - mean)^2 form made
        # XLA materialize + relayout full fp32 activations around each
        # reduction (measured ~4 ms/run of {3,1,2,0}<->{0,3,2,1} copies in
        # fnet at Sintel size).  The difference form loses ~1e-7 relative
        # on fp32 inputs (activations are O(1) here) and nothing on bf16
        # inputs, whose storage already rounds at 2^-8.
        B, H, W, C = x.shape
        if self.stats == "dot2":
            # Multi-dim contraction straight on the NHWC tensor — no
            # reshape(B, HW, C) view, so layout assignment is free to read
            # the producing conv's blocked layout instead of relayouting
            # the full activation to a row-major matrix (the copy.92x
            # family: 527 MB f32 + 264 MB bf16 per forward at Sintel size).
            ones2 = jnp.ones((H, W), x.dtype)
            s1 = jax.lax.dot_general(
                x, ones2, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, C]
            s2 = jax.lax.dot_general(
                jax.lax.square(x), ones2,
                dimension_numbers=(((1, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, C]
            mean = (s1 / (H * W)).reshape(B, 1, 1, C)
            mean_sq = (s2 / (H * W)).reshape(B, 1, 1, C)
        elif self.stats == "dot":
            # Moments as dots so the big operand keeps the producing conv's
            # layout: a plain reduce made XLA assign the convert/reduce
            # operand its own layout and relayout-copy the full activation
            # around every fnet norm (527 MB f32/forward at Sintel size,
            # HLO copy.921 family).  sum(x) contracts against ones; sum(x^2)
            # is a per-(B,C) self-contraction — no x^2 temporary.
            x3 = x.reshape(B, H * W, C)
            ones = jnp.ones((H * W,), x.dtype)
            s1 = jax.lax.dot_general(
                ones, x3, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, C]
            # x^2 materializes in x.dtype (same rounding as the 'mean'
            # path, whose lax.square is also computed in x.dtype) — a
            # ~29 MB bf16 temporary at Sintel size vs the 527 MB fp32
            # relayout the reduce form cost.
            s2 = jax.lax.dot_general(
                ones, jax.lax.square(x3),
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, C]
            mean = (s1 / (H * W)).reshape(B, 1, 1, C)
            mean_sq = (s2 / (H * W)).reshape(B, 1, 1, C)
        else:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
            mean_sq = jnp.mean(jax.lax.square(x), axis=(1, 2), keepdims=True,
                               dtype=jnp.float32)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        scale = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean.astype(x.dtype)) * scale.astype(x.dtype)
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing axis, eps 1e-12 by default (SETrans parity)."""

    epsilon: float = 1e-12
    use_affine: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_affine:
            dim = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            y = y * scale + bias
        return y.astype(self.dtype)


def make_norm(norm_fn: str, features: int, train: bool, dtype=jnp.float32):
    """Build the reference's norm zoo (extractor.py:16-38).

    For 'batch', caller must run inside a flax module with a 'batch_stats'
    collection; `train=False` (or frozen BN) uses running averages.
    """
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=features // 8, epsilon=1e-5, dtype=dtype,
                            param_dtype=jnp.float32)
    if norm_fn == "group8":
        return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=dtype,
                            param_dtype=jnp.float32)
    if norm_fn == "batch":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32)
    if norm_fn == "instance":
        return InstanceNorm(dtype=dtype)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unknown norm_fn {norm_fn}")
