"""GMA attention / aggregation (reference core/gma.py:6-142).

Attention produces a [B, heads, U, U] map over frame-1 context features with
decomposed relative position embeddings; Aggregate applies it to V-projected
motion features with a learnable scalar-gated residual.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from craft_tpu.nn.layers import Conv


class RelPosEmb(nn.Module):
    """Decomposed relative H/W position scores (reference gma.py:6-50).

    Two embedding tables of size (2*max_pos_size-1, dim_head); score between
    query at (x, y) and key at (u, v) is <q, emb_h[u-x]> + <q, emb_w[v-y]>.
    """

    max_pos_size: int = 160
    dim_head: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q):
        # q: [B, heads, h, w, d]
        B, heads, h, w, d = q.shape
        init = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default N(0,1)
        rel_height = self.param("rel_height", init,
                                (2 * self.max_pos_size - 1, self.dim_head),
                                jnp.float32)
        rel_width = self.param("rel_width", init,
                               (2 * self.max_pos_size - 1, self.dim_head),
                               jnp.float32)
        # rel_ind[i, j] = j - i + max_pos_size - 1
        idx_h = (jnp.arange(h)[None, :] - jnp.arange(h)[:, None]
                 + self.max_pos_size - 1)
        idx_w = (jnp.arange(w)[None, :] - jnp.arange(w)[:, None]
                 + self.max_pos_size - 1)
        emb_h = rel_height[idx_h].astype(self.dtype)  # [h, h, d] (x, u)
        emb_w = rel_width[idx_w].astype(self.dtype)   # [w, w, d] (y, v)

        height_score = jnp.einsum("bhxyd,xud->bhxyu", q, emb_h)[..., :, None]
        width_score = jnp.einsum("bhxyd,yvd->bhxyv", q, emb_w)[..., None, :]
        return height_score + width_score  # [B, heads, h, w, h, w]


class Attention(nn.Module):
    """GMA attention over context features (reference gma.py:53-102).

    Returns softmaxed [B, heads, U, U] attention.
    """

    dim: int = 128
    max_pos_size: int = 160
    heads: int = 1
    dim_head: int = 128
    position_only: bool = False
    position_and_content: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap):
        # fmap: [B, h, w, dim]
        B, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        qk = Conv(inner * 2, (1, 1), use_bias=False, dtype=self.dtype,
                  name="to_qk")(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q.reshape(B, h, w, self.heads, self.dim_head).transpose(0, 3, 1, 2, 4)
        k = k.reshape(B, h, w, self.heads, self.dim_head).transpose(0, 3, 1, 2, 4)
        q = q * (self.dim_head ** -0.5)

        if self.position_only:
            sim = RelPosEmb(self.max_pos_size, self.dim_head, self.dtype,
                            name="pos_emb")(q)
        elif self.position_and_content:
            sim = jnp.einsum("bhxyd,bhuvd->bhxyuv", q, k)
            sim = sim + RelPosEmb(self.max_pos_size, self.dim_head, self.dtype,
                                  name="pos_emb")(q)
        else:
            # Default (content-only).  NOTE: pos_emb params still exist in the
            # reference model even when unused; keep them for checkpoint parity.
            RelPosEmb(self.max_pos_size, self.dim_head, self.dtype,
                      name="pos_emb")(q[:, :, :1, :1])  # touch params only
            sim = jnp.einsum("bhxyd,bhuvd->bhxyuv", q, k)

        from craft_tpu.parallel.sp import sp_shard
        sim = sp_shard(sim.reshape(B, self.heads, h * w, h * w), 2)
        return sp_shard(
            nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype), 2)


class Aggregate(nn.Module):
    """Attention-weighted V aggregation with gated residual (reference gma.py:105-142)."""

    dim: int = 128
    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, attn, fmap):
        # attn: [B, heads, U, U]; fmap: [B, h, w, dim]
        B, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        v = Conv(inner, (1, 1), use_bias=False, dtype=self.dtype, name="to_v")(fmap)
        v = v.reshape(B, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, h, w, inner)
        if inner != self.dim:
            out = Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                       name="project")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return fmap + gamma.astype(self.dtype) * out
