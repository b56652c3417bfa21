"""Research-ablation variants (reference core/setrans_ablation.py:8-251).

Positional-code ablations (rand / fixed-2D-sinusoidal / zero embedders) and
the standard multi-head attention ablation of ExpandedFeatTrans
(--ablatemultihead; num_modes is reused as num_heads).  These complete the
pos_code_type config surface: {'bias', 'lsinu', 'rand', 'sinu', 'zero'}.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from craft_tpu.config import SETransSiteConfig
from craft_tpu.nn.layers import Dense, LayerNorm, normal_init


def positional_encoding_2d(pos_embed_dim: int, height: int,
                           width: int) -> np.ndarray:
    """Fixed 2D sinusoidal table [H, W, C]: first half encodes x (width),
    second half y (height), interleaved sin/cos (setrans_ablation.py:8-30)."""
    assert pos_embed_dim % 4 == 0
    pe = np.zeros((pos_embed_dim, height, width), np.float32)
    half = pos_embed_dim // 2
    div = np.exp(np.arange(0.0, half, 2) * -(math.log(10000.0) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    pe[0:half:2] = np.sin(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div).T[:, :, None].repeat(width, axis=2)
    pe[half + 1::2] = np.cos(pos_h * div).T[:, :, None].repeat(width, axis=2)
    return pe.transpose(1, 2, 0)


class RandPosEmbedder(nn.Module):
    """Learned per-cell embedding table, position-independent lookup
    (ablation; setrans_ablation.py:32-47)."""

    pos_embed_dim: int
    shape: Tuple[int, int] = (36, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed):
        B, N, _ = pos_normed.shape
        h, w = self.shape
        table = self.param("pos_embed", nn.initializers.normal(1.0),
                           (h * w, self.pos_embed_dim), jnp.float32)
        out = LayerNorm(use_affine=False, dtype=self.dtype,
                        name="norm")(table[:N])
        return jnp.broadcast_to(out[None], (B, N, self.pos_embed_dim))


class SinuPosEmbedder(nn.Module):
    """Fixed 2D sinusoidal embeddings (ablation; setrans_ablation.py:49-61)."""

    pos_embed_dim: int
    shape: Tuple[int, int] = (36, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed):
        B, N, _ = pos_normed.shape
        pe = jnp.asarray(positional_encoding_2d(
            self.pos_embed_dim, *self.shape).reshape(-1, self.pos_embed_dim))
        return jnp.broadcast_to(pe[None, :N], (B, N, self.pos_embed_dim)) \
            .astype(self.dtype)


class ZeroEmbedder(nn.Module):
    pos_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed):
        B, N, _ = pos_normed.shape
        return jnp.zeros((B, N, self.pos_embed_dim), self.dtype)


class MultiHeadFeatTrans(nn.Module):
    """Standard-MHA ablation of ExpandedFeatTrans (setrans_ablation.py:181-251):
    per-head dim = feat_dim/num_heads, attention fuses V early, then shared
    FFN + output with residual + LayerNorm; heads concatenated (not pooled)."""

    cfg: SETransSiteConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_feat, attention_probs, deterministic=True):
        cfg = self.cfg
        B, U2, _ = input_feat.shape
        M = cfg.num_modes
        F = cfg.feat_dim
        dh = F // M

        v = Dense(dh * M, kernel_init=normal_init(cfg.base_initializer_range),
                  bias_init=nn.initializers.zeros, dtype=self.dtype,
                  name="first_linear")(input_feat)
        v = v.reshape(B, U2, M, dh).transpose(0, 2, 1, 3)  # [B, M, U2, dh]
        fused = jnp.einsum("bmij,bmjd->bmid",
                           attention_probs.astype(self.dtype), v)
        x = fused  # heads kept separate through the FFN ([B, M, U1, dh])

        mid = Dense(dh, kernel_init=normal_init(cfg.base_initializer_range),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="intermediate")(x)
        mid = nn.gelu(mid, approximate=False)
        out = Dense(dh, kernel_init=normal_init(cfg.base_initializer_range),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="output")(mid)
        out = out + x
        out = nn.Dropout(rate=cfg.hidden_dropout_prob)(
            out, deterministic=deterministic)
        out = LayerNorm(name="resout_norm")(out)
        # Concatenate heads back to feat_dim.
        U1 = out.shape[2]
        return out.transpose(0, 2, 1, 3).reshape(B, U1, M * dh)
