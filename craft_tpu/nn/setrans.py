"""SETrans attention stack (reference core/setrans.py:71-800).

Multi-mode squeeze-expansion transformer pieces used three ways in CRAFT:
  * inter-frame attentional correlation (out_attn_scores_only),
  * F2 semantic-smoothing self-attention (feature output, input skip, no FFN),
  * intra-frame attention + motion aggregator (out_attn_probs_only +
    ExpandedFeatTrans).

TPU-native notes: the sliding positional bias is computed as a relative-offset
gather (not the reference's scatter into a padded [H,W,H+2R,W+2R] buffer,
setrans.py:690-708); attention clamping matches the reference's *conditional*
clamp (only applied when the global max exceeds attn_clip, setrans.py:527-529);
softmax/normalization accumulate in fp32.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from craft_tpu.config import SETransSiteConfig
from craft_tpu.nn.layers import Dense, LayerNorm, normal_init


class SlidingBias(NamedTuple):
    """Structured sliding positional bias: the raw (2R+1)^2 window plus grid
    shape.  Densified lazily on the XLA path; the Pallas kernels assemble the
    bias per tile from a [2R+1, W8, W8] block-Toeplitz table instead."""

    biases: jnp.ndarray  # [2R+1, 2R+1]
    H: int
    W: int

    def dense(self) -> jnp.ndarray:
        return sliding_pos_biases(self.biases, self.H, self.W)


def _as_dense_bias(pos_biases):
    if isinstance(pos_biases, SlidingBias):
        return pos_biases.dense()
    return pos_biases


def _pallas_allowed(cfg: "SETransSiteConfig", attention_mask) -> bool:
    """Single source of truth for whether a site may use Pallas kernels
    (shared by CrossAttFeatTrans branch selection and the module-level
    availability probes, so the two can never drift — ADVICE r2).

    Under a sequence_parallel context the kernels run through the shard_map
    wrappers (parallel/sequence_parallel.py); branches whose grid doesn't
    divide the mesh axis fall back to the GSPMD-XLA path per-site
    (sp_kernels_ok in CrossAttFeatTrans)."""
    mode = cfg.use_pallas
    if mode == "off" or attention_mask is not None:
        return False
    return mode == "on" or jax.default_backend() == "tpu"


def _fused_norm_conditions(cfg: "SETransSiteConfig", H8: int, W8: int,
                           deterministic: bool, attention_mask=None):
    """(name, ok) pairs for the fused clamp+aggregate+global-norm branch;
    ALL must hold.  Used by both fused_norm_available() and the in-module
    check in CrossAttFeatTrans, so the condition sets are one set."""
    from craft_tpu.ops.pallas.mode_attention import _fused_norm_tiles
    from craft_tpu.parallel.sp import sp_context
    sp_ctx = sp_context()
    if sp_ctx is None:
        rows_ok = True
        tiles_ok = _fused_norm_tiles(H8, W8) is not None
    else:
        # Sequence-parallel: the cross-shard variant (pmax'd clamp
        # predicate + psum'd moments, sp_fused_agg_corr_norm_mt) needs the
        # row grid to divide the mesh axis and the local shard to tile.
        n_sp = sp_ctx.mesh.shape[sp_ctx.axis]
        rows_ok = H8 % n_sp == 0
        tiles_ok = rows_ok and _fused_norm_tiles(
            H8, W8, h8_q=H8 // n_sp) is not None
    return [
        ("token rows divide the sequence-parallel mesh axis", rows_ok),
        ("deterministic (inference only)", deterministic),
        ("out_attn_scores_only site", cfg.out_attn_scores_only),
        ("multi-mode (num_modes > 1)", cfg.num_modes > 1),
        ("sliding positional bias (pos_code_type='bias')",
         cfg.pos_code_type == "bias"),
        ("use_pallas enabled for this backend, no attention_mask",
         _pallas_allowed(cfg, attention_mask)),
        (f"divisor-exact Mosaic tiling for grid ({H8}, {W8})", tiles_ok),
    ]


def fused_norm_available(cfg: "SETransSiteConfig", H8: int, W8: int,
                         deterministic: bool) -> bool:
    """Statically decide whether a scores-only site will take the fused
    clamp+norm kernel for a (H8, W8) grid — callers gate on this so the
    fused request never has to change output shape mid-trace (and no flag
    has to round-trip through nn.remat)."""
    return all(ok for _, ok in
               _fused_norm_conditions(cfg, H8, W8, deterministic))


@jax.tree_util.register_pytree_node_class
class QuantizedProbs:
    """Materialized attention probs in int8 fixed point: probs = num * scale
    with num = round(exp(s - rowmax) * 127) and scale = 1/(127 * l) per row
    (ops/pallas/mode_attention.py::mode_softmax_probs_mt(quantized=True)).
    Halves the HBM bytes the per-iteration aggregate streams; the consumer
    (ExpandedFeatTrans) folds the per-row scale into the einsum OUTPUT, so
    the matmul reads raw int8."""

    def __init__(self, num, scale):
        self.num = num      # [B, M, U, U] int8
        self.scale = scale  # [B, M, U, 1] f32

    @property
    def dtype(self):
        return self.num.dtype

    def tree_flatten(self):
        return (self.num, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class LazyModeAttention:
    """Intra-frame attention held as (q, k, bias window) instead of a
    materialized [B, M, U, U] prob tensor (~400 MB/sample fp16 at Sintel
    size).  The motion aggregator re-applies flash attention each refinement
    iteration: recomputing QK^T costs ~md/F extra MXU work on top of the
    unavoidable probs@V matmul, far cheaper than streaming the U^2 probs from
    HBM twelve times — and the tensor never exists, so batched serving isn't
    memory-bound.  (Replaces the reference's materialized `attention` from
    network.py:154-166 consumed by update.py:129-156.)

    Registered as a pytree with (H, W, pos_w) static so the grid shape stays
    a Python int across jit boundaries."""

    def __init__(self, q, k, biases, H, W, clip_val, pos_w):
        self.q = q            # [B, M, U, md]
        self.k = k            # [B, M, U, md]
        self.biases = biases  # [2R+1, 2R+1] sliding window
        self.H = H
        self.W = W
        self.clip_val = clip_val  # conditional-clamp threshold (scalar)
        self.pos_w = pos_w

    def tree_flatten(self):
        return (self.q, self.k, self.biases, self.clip_val), \
            (self.H, self.W, self.pos_w)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, k, biases, clip_val = children
        H, W, pos_w = aux
        return cls(q=q, k=k, biases=biases, H=H, W=W, clip_val=clip_val,
                   pos_w=pos_w)


def sliding_pos_biases(biases: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Expand the learnable (2R+1)^2 window into a dense [H*W, H*W] bias table.

    pos[i*W+j, h2*W+w2] = biases[h2-i+R, w2-j+R] when both |h2-i|<=R and
    |w2-j|<=R, else 0 — the same table the reference builds by scatter
    (setrans.py:690-708), produced here with two clipped gathers.
    """
    R = (biases.shape[0] - 1) // 2
    dh = jnp.arange(H)[None, :] - jnp.arange(H)[:, None]  # [i, h2] = h2 - i
    dw = jnp.arange(W)[None, :] - jnp.arange(W)[:, None]
    mh = (jnp.abs(dh) <= R)
    mw = (jnp.abs(dw) <= R)
    ih = jnp.clip(dh + R, 0, 2 * R)
    iw = jnp.clip(dw + R, 0, 2 * R)
    # table[i, h2, j, w2] = biases[ih[i,h2], iw[j,w2]]
    table = biases[ih][:, :, iw]  # [H, H, W, W]
    table = table * (mh[:, :, None, None] & mw[None, None, :, :])
    # reorder to [i, j, h2, w2] then flatten query/key axes.
    table = table.transpose(0, 2, 1, 3)
    return table.reshape(H * W, H * W)


class SlidingPosBiases2D(nn.Module):
    """Learnable (2R+1)x(2R+1) relative position bias (reference setrans.py:644-708)."""

    pos_bias_radius: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, H: int, W: int) -> "SlidingBias":
        R = self.pos_bias_radius
        biases = self.param("biases", nn.initializers.zeros,
                            (2 * R + 1, 2 * R + 1), jnp.float32)
        return SlidingBias(biases, H, W)


class LearnedSinuPosEmbedder(nn.Module):
    """pos_code_type='lsinu': Linear(2->C) -> interleaved sin/cos -> LayerNorm
    (reference setrans.py:623-642)."""

    pos_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pos_normed):
        p = Dense(self.pos_embed_dim, dtype=jnp.float32, name="pos_fc")(pos_normed)
        s = jnp.sin(p[..., 0::2])
        c = jnp.cos(p[..., 1::2])
        mixed = jnp.stack([s, c], axis=-1).reshape(p.shape)
        return LayerNorm(use_affine=False, name="norm")(mixed).astype(self.dtype)


class InputFeatEncoder(nn.Module):
    """Flatten NHWC -> [B, U, C] tokens with positional code handling
    (reference SETransInputFeatEncoder, setrans.py:710-800).

    For pos_code_type='bias' the positional signal is returned as additive
    attention biases [U, U] instead of being mixed into the features (which are
    just LayerNorm'd + dropout'd).
    """

    cfg: SETransSiteConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis_feat, deterministic: bool = True,
                 return_pos_biases: bool = True):
        B, H, W, C = vis_feat.shape
        tokens = vis_feat.reshape(B, H * W, C)

        pos_biases = None
        if self.cfg.pos_code_type == "bias":
            if return_pos_biases:
                pos_biases = SlidingPosBiases2D(
                    self.cfg.pos_bias_radius, name="pos_coder")(H, W)
        else:
            ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                                  jnp.arange(W, dtype=jnp.float32), indexing="ij")
            coords = jnp.stack([ys, xs], axis=-1).reshape(1, H * W, 2)
            coords = coords / jnp.maximum(coords.max(), 1.0)
            if self.cfg.pos_code_type == "lsinu":
                pos_embed = LearnedSinuPosEmbedder(C, self.dtype,
                                                   name="pos_coder")(coords)
            elif self.cfg.pos_code_type == "zero":
                from craft_tpu.nn.setrans_ablation import ZeroEmbedder
                pos_embed = ZeroEmbedder(C, self.dtype,
                                         name="pos_coder")(coords)
            elif self.cfg.pos_code_type == "rand":
                from craft_tpu.nn.setrans_ablation import RandPosEmbedder
                pos_embed = RandPosEmbedder(C, (H, W), self.dtype,
                                            name="pos_coder")(coords)
            elif self.cfg.pos_code_type == "sinu":
                from craft_tpu.nn.setrans_ablation import SinuPosEmbedder
                pos_embed = SinuPosEmbedder(C, (H, W), self.dtype,
                                            name="pos_coder")(coords)
            else:
                raise NotImplementedError(
                    f"pos_code_type {self.cfg.pos_code_type}")
            tokens = tokens + self.cfg.pos_code_weight * pos_embed

        tokens = LayerNorm(use_affine=False, dtype=self.dtype,
                           name="comb_norm")(tokens)
        tokens = nn.Dropout(rate=self.cfg.hidden_dropout_prob)(
            tokens, deterministic=deterministic)
        if return_pos_biases:
            return tokens, pos_biases
        return tokens


def drop_path(x, rate: float, rng, deterministic: bool):
    """Stochastic depth per sample (reference setrans.py:42-69; off by
    default — drop_path_prob=0)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return x / keep * mask.astype(x.dtype)


class LearnedSoftAggregate(nn.Module):
    """Learned softmax pooling over the modes axis (reference setrans.py:279-300).

    num_feat=1: per-element scalar score w*x+b; num_feat=C: linear score over the
    trailing feature axis.  Aggregates over `group_dim` (the modes axis = 1).
    """

    num_feat: int
    keepdim: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.feat2score = Dense(1, dtype=self.dtype)

    def __call__(self, x, score_basis=None):
        if score_basis is None:
            score_basis = x
        if self.num_feat == 1:
            scores = self.feat2score(score_basis[..., None])[..., 0]
        else:
            scores = self.feat2score(score_basis)
        probs = nn.softmax(scores.astype(jnp.float32), axis=1).astype(x.dtype)
        out = jnp.sum(x * probs, axis=1, keepdims=self.keepdim)
        return out

    def scalar_wb(self):
        """Recover (w, b) of the scalar score function by probing the linear
        layer — used by the fused Pallas correlation kernel (num_feat=1)."""
        probe = self.feat2score(jnp.asarray([[0.0], [1.0]], jnp.float32))
        b = probe[0, 0]
        w = probe[1, 0] - b
        return w, b


def _first_linear_init(cfg: SETransSiteConfig):
    """normal(0, 0.02) + identity bias on the first mode's block
    (reference setrans.py:350-360): kernel[:F, :F] = kernel*0.5 + I*0.02*scale."""
    base = cfg.base_initializer_range

    def init(key, shape, dtype=jnp.float32):
        w = base * jax.random.normal(key, shape, dtype)
        if cfg.feattrans_lin1_idbias_scale > 0:
            F = cfg.feat_dim
            eye = jnp.eye(F, dtype=dtype) * base * cfg.feattrans_lin1_idbias_scale
            block = w[:F, :F] * 0.5 + eye
            w = w.at[:F, :F].set(block)
        return w

    return init


def _key_init(cfg: SETransSiteConfig):
    """normal(0, 0.02) + per-mode identity bias on the first mode's rows
    (reference setrans.py:485-493), transposed to flax [in, out] layout."""
    base = cfg.base_initializer_range

    def init(key, shape, dtype=jnp.float32):
        w = base * jax.random.normal(key, shape, dtype)
        if cfg.query_idbias_scale > 0:
            md = cfg.mode_dim
            in_dim = shape[0]
            reps = in_dim // md
            eye_rep = jnp.tile(jnp.eye(md, dtype=dtype), (reps, 1)) \
                * base * cfg.query_idbias_scale  # [in, md]
            block = w[:, :md] * 0.5 + eye_rep
            w = w.at[:, :md].set(block)
        return w

    return init


class CrossAttFeatTrans(nn.Module):
    """Multi-mode cross attention (reference setrans.py:412-566).

    Three output modes:
      * out_attn_scores_only -> mode-aggregated raw scores [B, 1, U1, U2]
      * out_attn_probs_only  -> softmax probs [B, M, U1, U2]
      * otherwise            -> features via ExpandedFeatTrans [B, U1, F]
    """

    cfg: SETransSiteConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_feat, key_feat=None, pos_biases=None,
                 attention_mask=None, deterministic: bool = True,
                 fused_norm_dtype=None):
        """fused_norm_dtype (scores-only sites): run the fused
        clamp+aggregate+global-layer-norm kernel and return the normalized
        [B, U1, U2] volume in that dtype instead of raw scores.  The caller
        must have checked ``fused_norm_available`` — conditions are asserted,
        not silently degraded (the output shape/semantics differ)."""
        cfg = self.cfg
        if key_feat is None:
            key_feat = query_feat
        M, md = cfg.num_modes, cfg.mode_dim
        B, U1, _ = query_feat.shape
        U2 = key_feat.shape[1]

        tied = cfg.tie_qk_scheme == "shared"
        if tied:
            # One parameter used for both projections (reference tie_qk,
            # setrans.py:470-478: key.weight IS query.weight, and the identity
            # bias applied to `key` mutates the shared tensor).
            qk = Dense(M * md, use_bias=cfg.qk_have_bias,
                       kernel_init=_key_init(cfg),
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="query")
            q = qk(query_feat)
            k = qk(key_feat)
        else:
            q = Dense(M * md, use_bias=cfg.qk_have_bias,
                      kernel_init=normal_init(cfg.base_initializer_range),
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="query")(query_feat)
            k = Dense(M * md, use_bias=cfg.qk_have_bias,
                      kernel_init=_key_init(cfg),
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="key")(key_feat)

        q = q.reshape(B, U1, M, md).transpose(0, 2, 1, 3)
        k = k.reshape(B, U2, M, md).transpose(0, 2, 1, 3)

        # --- Pallas fast paths (TPU, inference): never materialize the
        # [B, M, U, U] score tensor (SURVEY.md §5.7).  Falls back to the XLA
        # path for training (dropout / autodiff) and non-TPU backends.
        use_pallas = self._pallas_enabled(deterministic, attention_mask)
        interp = jax.default_backend() != "tpu"  # interpret kernels off-TPU
        structured = isinstance(pos_biases, SlidingBias)
        if structured and not cfg.out_attn_scores_only:
            from craft_tpu.ops.pallas.mode_attention import mt_alignment_ok
            # Mosaic tile alignment: fall back to the dense-bias kernels
            # (padded internally) when W8-multiples don't align to (8, 128).
            # (The scores-only path selects its kernel inside corr_vjp.)
            if not (mt_alignment_ok(pos_biases.W) or interp):
                if self._pallas_allowed(attention_mask):
                    pos_biases = pos_biases.dense()
                structured = isinstance(pos_biases, SlidingBias)
        # Sequence parallelism: the same kernels run row-sharded through the
        # shard_map wrappers (parallel/sequence_parallel.py) when the token
        # grid divides the mesh axis; otherwise the site falls back to the
        # GSPMD-XLA path below (whose sp_shard constraints still shard it).
        from craft_tpu.parallel.sp import sp_context
        sp_ctx = sp_context()
        if sp_ctx is not None:
            n_sp = sp_ctx.mesh.shape[sp_ctx.axis]
            sp_kernels_ok = deterministic and (
                pos_biases.H % n_sp == 0 if structured else U1 % n_sp == 0)
        else:
            sp_kernels_ok = True
        use_pallas = use_pallas and sp_kernels_ok
        # The scores-only (correlation) site applies no dropout (reference
        # setrans.py:544-550), so its Pallas forward is usable in TRAINING
        # too via a custom VJP (Pallas forward + XLA backward) when the
        # sliding bias is structured.
        scores_pallas = (self._pallas_allowed(attention_mask)
                         and (deterministic or structured)
                         and sp_kernels_ok
                         # --attn_diag: the clamp telemetry (reference
                         # setrans.py:520-536 prints) sows from the XLA
                         # scores path; route this site there too when the
                         # diagnostics collection is being collected.  NOT
                         # during init: flax init leaves every collection
                         # except 'intermediates' mutable, so without the
                         # is_initializing() exemption init would take the
                         # XLA branch and hand the prenormed caller a 4-D
                         # score tensor (pyramid_from_level0 crash).
                         and not (self.is_mutable_collection("diagnostics")
                                  and not self.is_initializing()))
        if scores_pallas and cfg.out_attn_scores_only and M > 1:
            from craft_tpu.ops.pallas.mode_attention import (
                fused_agg_corr, fused_agg_corr_norm_mt, scores_global_max)
            agg = LearnedSoftAggregate(1, keepdim=True, dtype=jnp.float32,
                                       name="attn_softaggr")
            agg_w, agg_b = agg.scalar_wb()
            iodt = self.dtype  # bf16 matmul inputs under mixed precision
            if fused_norm_dtype is not None:
                # One fused pass: conditional clamp (predicate in-kernel) +
                # soft-aggregation + global layer-norm; the only volume-sized
                # HBM traffic is the normalized level-0 write.
                conds = _fused_norm_conditions(
                    cfg, pos_biases.H if structured else 0,
                    pos_biases.W if structured else 0, deterministic,
                    attention_mask)
                conds.append(("structured SlidingBias pos_biases",
                              structured))
                bad = [name for name, ok in conds if not ok]
                if bad:
                    raise ValueError(
                        "fused_norm_dtype was requested but the fused-branch "
                        f"conditions failed: {'; '.join(bad)}. Callers must "
                        "gate on fused_norm_available().")
                if sp_ctx is not None:
                    from craft_tpu.parallel.sequence_parallel import (
                        sp_fused_agg_corr_norm_mt)
                    return sp_fused_agg_corr_norm_mt(
                        sp_ctx.mesh, q, k, pos_biases.biases,
                        (pos_biases.H, pos_biases.W), cfg.attn_clip,
                        cfg.pos_code_weight, agg_w, agg_b,
                        axis=sp_ctx.axis, out_dtype=fused_norm_dtype,
                        interpret=interp, io_dtype=iodt)
                vol, _ = fused_agg_corr_norm_mt(
                    q, k, pos_biases.biases, (pos_biases.H, pos_biases.W),
                    cfg.attn_clip, cfg.pos_code_weight, agg_w, agg_b,
                    out_dtype=fused_norm_dtype, interpret=interp,
                    io_dtype=iodt)
                return vol  # [B, U1, U2] normalized
            if sp_ctx is not None:
                # Row-sharded serving: same kernels via the shard_map
                # wrappers; the clamp predicate pmax-es across shards.
                from craft_tpu.ops.pallas.mode_attention import (
                    mt_alignment_ok)
                from craft_tpu.parallel.sequence_parallel import (
                    sp_fused_agg_corr, sp_fused_agg_corr_mt,
                    sp_scores_global_max)
                gmax = jax.lax.stop_gradient(sp_scores_global_max(
                    sp_ctx.mesh, jax.lax.stop_gradient(q),
                    jax.lax.stop_gradient(k), 1.0 / math.sqrt(md),
                    axis=sp_ctx.axis, interpret=interp, io_dtype=iodt))
                clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip,
                                     1e30)
                if structured and not (mt_alignment_ok(pos_biases.W)
                                       or interp):
                    # Mirror fused_agg_corr_diff's kernel selection: the
                    # block-Toeplitz kernel tiles tk = rk*W8 which must be a
                    # multiple of 128; common SP big-frame widths fail (e.g.
                    # 1920 px -> W8=240 -> tk=480).  Densify the bias and
                    # take the dense-bias kernel instead of a Mosaic
                    # compile error.
                    pos_biases = pos_biases.dense()
                    structured = isinstance(pos_biases, SlidingBias)
                if structured:
                    vol = sp_fused_agg_corr_mt(
                        sp_ctx.mesh, q, k, pos_biases.biases,
                        (pos_biases.H, pos_biases.W), clip_val,
                        cfg.pos_code_weight, agg_w, agg_b, axis=sp_ctx.axis,
                        interpret=interp, io_dtype=iodt)
                else:
                    bias2d = None if pos_biases is None else \
                        pos_biases.astype(jnp.float32)
                    vol = sp_fused_agg_corr(
                        sp_ctx.mesh, q, k, bias2d, clip_val,
                        cfg.pos_code_weight, agg_w, agg_b, axis=sp_ctx.axis,
                        interpret=interp, io_dtype=iodt)
                return vol[:, None]  # [B, 1, U1, U2] row-sharded
            # Batched kernels: B rides the Pallas grid, no per-sample vmap.
            gmax = jax.lax.stop_gradient(scores_global_max(
                jax.lax.stop_gradient(q), jax.lax.stop_gradient(k),
                1.0 / math.sqrt(md), interpret=interp, io_dtype=iodt))
            clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip, 1e30)
            if structured:
                from craft_tpu.ops.pallas.corr_vjp import fused_agg_corr_diff
                grid_hw = (pos_biases.H, pos_biases.W)
                vol = fused_agg_corr_diff(
                    q, k, pos_biases.biases, clip_val, cfg.pos_code_weight,
                    agg_w, agg_b, grid_hw, interp, iodt)
            else:
                bias2d = None if pos_biases is None else \
                    pos_biases.astype(jnp.float32)
                vol = fused_agg_corr(
                    q, k, bias2d, clip_val, cfg.pos_code_weight, agg_w,
                    agg_b, interpret=interp, io_dtype=iodt)
            return vol[:, None]  # [B, 1, U1, U2]

        if (use_pallas and not cfg.out_attn_only and not cfg.has_FFN
                and not cfg.ablate_multihead):
            from craft_tpu.ops.pallas.mode_attention import (
                flash_mode_attention, flash_mode_attention_mt,
                scores_global_max)
            iodt = self.dtype
            if sp_ctx is not None:
                from craft_tpu.parallel.sequence_parallel import (
                    sp_flash_mode_attention, sp_flash_mode_attention_mt,
                    sp_scores_global_max)
                gmax = sp_scores_global_max(
                    sp_ctx.mesh, q, k, 1.0 / math.sqrt(md),
                    axis=sp_ctx.axis, interpret=interp, io_dtype=iodt)
                clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip,
                                     1e30)
                if structured:
                    grid_hw = (pos_biases.H, pos_biases.W)

                    def attention_fn(v4d):
                        return sp_flash_mode_attention_mt(
                            sp_ctx.mesh, q, k, v4d, pos_biases.biases,
                            grid_hw, clip_val, cfg.pos_code_weight,
                            axis=sp_ctx.axis, interpret=interp,
                            io_dtype=iodt).astype(self.dtype)
                else:
                    bias2d = None if pos_biases is None else \
                        pos_biases.astype(jnp.float32)

                    def attention_fn(v4d):
                        return sp_flash_mode_attention(
                            sp_ctx.mesh, q, k, v4d, bias2d, clip_val,
                            cfg.pos_code_weight, axis=sp_ctx.axis,
                            interpret=interp,
                            io_dtype=iodt).astype(self.dtype)

                return ExpandedFeatTrans(cfg, dtype=self.dtype,
                                         name="out_trans")(
                    key_feat, None, deterministic=deterministic,
                    attention_fn=attention_fn)
            gmax = scores_global_max(q, k, 1.0 / math.sqrt(md),
                                     interpret=interp, io_dtype=iodt)
            clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip, 1e30)

            if structured:
                grid_hw = (pos_biases.H, pos_biases.W)

                def attention_fn(v4d):  # [B, M, U2, F] -> [B, M, U1, F]
                    return flash_mode_attention_mt(
                        q, k, v4d, pos_biases.biases, grid_hw, clip_val,
                        cfg.pos_code_weight, interpret=interp,
                        io_dtype=iodt).astype(self.dtype)
            else:
                bias2d = None if pos_biases is None else \
                    pos_biases.astype(jnp.float32)

                def attention_fn(v4d):  # [B, M, U2, F] -> [B, M, U1, F]
                    return flash_mode_attention(
                        q, k, v4d, bias2d, clip_val, cfg.pos_code_weight,
                        interpret=interp, io_dtype=iodt).astype(self.dtype)

            return ExpandedFeatTrans(cfg, dtype=self.dtype, name="out_trans")(
                key_feat, None, deterministic=deterministic,
                attention_fn=attention_fn)

        # --- training-side flash attention (f2/intra sites) ---
        # Under bf16 training, compute the softmax probs via a Pallas
        # forward + closed-form XLA backward (ops/pallas/probs_vjp.py): the
        # fp32 [B, M, U, U] scores + exp temporaries of the XLA softmax —
        # and their full remat recompute in the backward — never exist.
        # The fullprec (f32) path keeps the exact XLA softmax below, so
        # golden/grad-parity claims stay on the reference path.
        train_probs_kernel = (
            not deterministic
            and sp_ctx is None  # SP is a serving feature; train via XLA
            and not cfg.out_attn_scores_only
            and not cfg.ablate_multihead
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and self._pallas_allowed(attention_mask)
            and pos_biases is not None
            and not self.is_mutable_collection("intermediates")
            and not self.is_mutable_collection("diagnostics"))
        if train_probs_kernel:
            from craft_tpu.ops.pallas.mode_attention import scores_global_max
            from craft_tpu.ops.pallas.probs_vjp import mode_softmax_probs_diff
            iodt = self.dtype
            gmax = scores_global_max(jax.lax.stop_gradient(q),
                                     jax.lax.stop_gradient(k),
                                     1.0 / math.sqrt(md),
                                     interpret=interp, io_dtype=iodt)
            clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip, 1e30)
            if structured:
                probs = mode_softmax_probs_diff(
                    q, k, pos_biases.biases, clip_val, cfg.pos_code_weight,
                    (pos_biases.H, pos_biases.W), True, interp, iodt,
                    self.dtype)
            else:
                bias2d = _as_dense_bias(pos_biases).astype(jnp.float32)
                # Dense bias may arrive [.., U1, U2] with singleton leading
                # dims; the kernel wants the 2-D table.
                bias2d = bias2d.reshape(bias2d.shape[-2:])
                probs = mode_softmax_probs_diff(
                    q, k, bias2d, clip_val, cfg.pos_code_weight, (0, 0),
                    False, interp, iodt, self.dtype)
            return self._probs_output(probs, key_feat, deterministic)

        # --- XLA reference path ---
        from craft_tpu.parallel.sp import sp_shard
        q = sp_shard(q, 2)  # row (query-token) axis over the seq mesh
        scores = jnp.einsum("bmid,bmjd->bmij", q, k,
                            preferred_element_type=jnp.float32)
        scores = sp_shard(scores, 2) / math.sqrt(md)

        # Conditional clamp: only rescales when the global max exceeds attn_clip
        # (reference setrans.py:527-529).  jit-safe via where on the predicate.
        max_attn = jnp.max(scores)
        clipped = jnp.clip(scores, -cfg.attn_clip, cfg.attn_clip)
        scores = jnp.where(max_attn > cfg.attn_clip, clipped, scores)
        # Attention-health telemetry (reference max-attn/clamp-count prints,
        # setrans.py:520-536) — captured only when the 'diagnostics'
        # collection is mutable, so the compiled step stays host-free.
        self.sow("diagnostics", "max_attn", max_attn)
        self.sow("diagnostics", "avg_abs_attn", jnp.mean(jnp.abs(scores)))
        self.sow("diagnostics", "clamp_frac",
                 jnp.mean((jnp.abs(scores) >= cfg.attn_clip).astype(
                     jnp.float32)))

        if pos_biases is not None:
            # Dense bias is [U1, U2] (2-D) or [.., U1, U2]; shard its row axis.
            scores = scores + cfg.pos_code_weight * \
                sp_shard(_as_dense_bias(pos_biases).astype(scores.dtype), -2)
        if attention_mask is not None:
            scores = scores + attention_mask.astype(scores.dtype)

        if cfg.out_attn_scores_only:
            if M > 1:
                scores = LearnedSoftAggregate(1, keepdim=True, dtype=jnp.float32,
                                              name="attn_softaggr")(scores)
            return scores

        if (use_pallas and cfg.out_attn_probs_only and structured
                and not self.is_mutable_collection("intermediates")):
            from craft_tpu.ops.pallas.mode_attention import (
                mode_softmax_probs_mt, scores_global_max)
            iodt = self.dtype
            if sp_ctx is not None:
                # Row-sharded materialized probs: softmax rows are complete
                # within a shard (keys replicated), and the downstream
                # probs@V einsum stays row-local under GSPMD.
                from craft_tpu.parallel.sequence_parallel import (
                    sp_mode_softmax_probs_mt, sp_scores_global_max)
                gmax = sp_scores_global_max(
                    sp_ctx.mesh, q, k, 1.0 / math.sqrt(md),
                    axis=sp_ctx.axis, interpret=interp, io_dtype=iodt)
                clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip,
                                     1e30)
                if M > 1:
                    LearnedSoftAggregate(1, keepdim=True, dtype=jnp.float32,
                                         name="attn_softaggr").scalar_wb()
                if cfg.quantize_probs:
                    num, scales = sp_mode_softmax_probs_mt(
                        sp_ctx.mesh, q, k, pos_biases.biases,
                        (pos_biases.H, pos_biases.W), clip_val,
                        cfg.pos_code_weight, axis=sp_ctx.axis,
                        interpret=interp, io_dtype=iodt, quantized=True)
                    return QuantizedProbs(num, scales)
                return sp_mode_softmax_probs_mt(
                    sp_ctx.mesh, q, k, pos_biases.biases,
                    (pos_biases.H, pos_biases.W), clip_val,
                    cfg.pos_code_weight, axis=sp_ctx.axis,
                    out_dtype=self.dtype, interpret=interp, io_dtype=iodt)
            gmax = scores_global_max(q, k, 1.0 / math.sqrt(md),
                                     interpret=interp, io_dtype=iodt)
            clip_val = jnp.where(gmax > cfg.attn_clip, cfg.attn_clip, 1e30)
            if M > 1:
                LearnedSoftAggregate(1, keepdim=True, dtype=jnp.float32,
                                     name="attn_softaggr").scalar_wb()
            probs_bytes = B * M * U1 * U2 * jnp.dtype(self.dtype).itemsize
            if probs_bytes > 4e9:
                # Huge-batch serving: hand the consumer (q, k, bias window,
                # clamp) instead of materialized probs — the aggregator
                # applies flash attention per iteration (LazyModeAttention),
                # so the [B, M, U, U] tensor never exists and the batch fits
                # in HBM.  Measured: materialized probs are FASTER whenever
                # they fit (19.4 vs 16.6 pairs/s at batch 8, Sintel size —
                # this chip streams probs at ~700 GB/s, beating the flash
                # recompute), so lazy kicks in only past ~4 GB of probs.
                return LazyModeAttention(
                    q=q, k=k, biases=pos_biases.biases,
                    H=pos_biases.H, W=pos_biases.W,
                    clip_val=clip_val, pos_w=cfg.pos_code_weight)
            # Materialize probs once; the XLA probs@V einsum in the scan
            # body overlaps with GRU compute, which a per-iteration Pallas
            # custom call cannot (measured: 17.7 vs 13.4 fps at batch 1).
            # int8 fixed-point storage (cfg.quantize_probs) halves the
            # 396 MB/iteration the aggregate streams; ExpandedFeatTrans
            # applies the per-row dequant scale to the einsum output.
            if cfg.quantize_probs:
                num, scales = mode_softmax_probs_mt(
                    q, k, pos_biases.biases, (pos_biases.H, pos_biases.W),
                    clip_val, cfg.pos_code_weight, interpret=interp,
                    io_dtype=iodt, quantized=True)
                return QuantizedProbs(num, scales)
            return mode_softmax_probs_mt(
                q, k, pos_biases.biases, (pos_biases.H, pos_biases.W),
                clip_val, cfg.pos_code_weight, out_dtype=self.dtype,
                interpret=interp, io_dtype=iodt)

        probs = sp_shard(nn.softmax(scores, axis=-1).astype(self.dtype), 2)
        # Attention dump hook: apply(..., mutable=['intermediates']) captures
        # these (the reference's SAVEF2 env hook, setrans.py:603-612, done the
        # flax way — zero cost unless the collection is made mutable).
        self.sow("intermediates", "attn_probs", probs)
        return self._probs_output(probs, key_feat, deterministic)

    def _probs_output(self, probs, key_feat, deterministic):
        """Common tail after the softmax probs exist: attention dropout,
        then probs-only return or the ExpandedFeatTrans feature output.
        Shared by the XLA softmax path and the Pallas probs_vjp training
        path so param structure and dropout semantics cannot drift."""
        cfg = self.cfg
        if not deterministic and cfg.attention_probs_dropout_prob > 0:
            from craft_tpu.nn.layers import lean_dropout
            probs = lean_dropout(probs, cfg.attention_probs_dropout_prob,
                                 self.make_rng("dropout"))

        if cfg.out_attn_probs_only:
            if cfg.num_modes > 1:
                # The reference creates (but never applies) attn_softaggr in
                # the probs-only path too (setrans.py:432-436); keep the
                # params for state-dict structure parity.
                LearnedSoftAggregate(1, keepdim=True, dtype=jnp.float32,
                                     name="attn_softaggr").scalar_wb()
            return probs

        if cfg.ablate_multihead:
            from craft_tpu.nn.setrans_ablation import MultiHeadFeatTrans
            return MultiHeadFeatTrans(cfg, dtype=self.dtype,
                                      name="out_trans")(
                key_feat, probs, deterministic=deterministic)
        return ExpandedFeatTrans(cfg, dtype=self.dtype, name="out_trans")(
            key_feat, probs, deterministic=deterministic)

    def _pallas_allowed(self, attention_mask) -> bool:
        return _pallas_allowed(self.cfg, attention_mask)

    def _pallas_enabled(self, deterministic: bool, attention_mask) -> bool:
        if not self._pallas_allowed(attention_mask):
            return False
        if not deterministic:
            # The softmax paths need attention dropout + autodiff — the XLA
            # path handles both (the dropout-free scores-only site trains
            # through the Pallas forward via corr_vjp instead).
            return False
        return True


class ExpandedFeatTrans(nn.Module):
    """Multi-mode value expansion + fusion + mode pooling (reference
    setrans.py:304-410).  input_feat: [B, U2, C]; attention_probs: [B, M, U1, U2].
    """

    cfg: SETransSiteConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_feat, attention_probs, deterministic: bool = True,
                 attention_fn=None):
        cfg = self.cfg
        B, U2, _ = input_feat.shape
        M, F = cfg.num_modes, cfg.feat_dim

        v = Dense(M * F, use_bias=cfg.v_has_bias,
                  kernel_init=_first_linear_init(cfg),
                  bias_init=nn.initializers.zeros,
                  dtype=self.dtype, name="first_linear")(input_feat)
        v = v.reshape(B, U2, M, F).transpose(0, 2, 1, 3)  # [B, M, U2, F]

        if isinstance(attention_probs, LazyModeAttention):
            # Flash-aggregate: re-run the attention against this iteration's
            # values instead of reading materialized probs from HBM.
            la = attention_probs
            from craft_tpu.ops.pallas.mode_attention import \
                flash_mode_attention_mt
            interp = jax.default_backend() != "tpu"
            attention_fn = lambda v4d: flash_mode_attention_mt(  # noqa: E731
                la.q, la.k, v4d, la.biases, (la.H, la.W), la.clip_val,
                la.pos_w, interpret=interp,
                io_dtype=self.dtype).astype(self.dtype)

        if attention_fn is not None:
            # Fused (flash) application — probs are never materialized.
            fused = attention_fn(v)  # [B, M, U1, F]
        elif isinstance(attention_probs, QuantizedProbs):
            # int8 fixed-point probs (cfg.quantize_probs): the convert fuses
            # into the dot's operand read so only half the bytes stream from
            # HBM; the per-row softmax-denominator scale is linear in the
            # row and lands on the einsum OUTPUT.
            qp = attention_probs
            fused = jnp.einsum("bmij,bmjf->bmif",
                               qp.num.astype(self.dtype), v) * \
                qp.scale.astype(self.dtype)
        else:
            fused = jnp.einsum("bmij,bmjf->bmif",
                               attention_probs.astype(self.dtype), v)

        if cfg.has_FFN:
            # Shared mid linear + GELU, then private (grouped) output linear with
            # residual + LayerNorm (reference setrans.py:193-276).
            mid = Dense(F, kernel_init=normal_init(cfg.base_initializer_range),
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="intermediate")(fused)
            mid = nn.gelu(mid, approximate=False)
            mid = nn.Dropout(rate=cfg.hidden_dropout_prob)(
                mid, deterministic=deterministic)
            if cfg.trans_output_type == "private":
                # Per-mode private linear: einsum with a [M, F, F] kernel.
                wk = self.param("output_kernel",
                                normal_init(cfg.base_initializer_range),
                                (M, F, F), jnp.float32)
                wb = self.param("output_bias", nn.initializers.zeros,
                                (M, F), jnp.float32)
                out = jnp.einsum("bmif,mfg->bmig", mid, wk.astype(self.dtype)) \
                    + wb[None, :, None, :].astype(self.dtype)
                # NOTE reference MMPrivateOutput adds the residual then norms the
                # *pre-residual* tensor (x, not x_comb — setrans.py:240 uses x);
                # we follow the literal behavior: norm(dropout(x)).
                out = nn.Dropout(rate=cfg.hidden_dropout_prob)(
                    out, deterministic=deterministic)
                fused = LayerNorm(name="resout_norm")(out)
            else:
                out = Dense(F, kernel_init=normal_init(cfg.base_initializer_range),
                            bias_init=nn.initializers.zeros, dtype=self.dtype,
                            name="output_shared")(mid)
                out = out + fused
                out = nn.Dropout(rate=cfg.hidden_dropout_prob)(
                    out, deterministic=deterministic)
                fused = LayerNorm(name="resout_norm")(out)

        if cfg.pool_modes_feat == "softmax":
            pooled = LearnedSoftAggregate(F, keepdim=False, dtype=self.dtype,
                                          name="feat_softaggr")(fused)
        elif cfg.pool_modes_feat == "max":
            pooled = jnp.max(fused, axis=1)
        elif cfg.pool_modes_feat == "mean":
            pooled = jnp.mean(fused, axis=1)
        else:
            pooled = fused

        if cfg.has_input_skip:
            coeff = self.param("input_skip_coeff", nn.initializers.ones,
                               (1,), jnp.float32)
            if cfg.drop_path_prob > 0 and not deterministic:
                pooled = drop_path(pooled, cfg.drop_path_prob,
                                   self.make_rng("dropout"), deterministic)
            pooled = coeff.astype(self.dtype) * input_feat + pooled
            pooled = LayerNorm(use_affine=False, dtype=self.dtype,
                               name="skip_layer_norm")(pooled)
        return pooled


class SelfAttVisPosTrans(nn.Module):
    """Self-attention wrapper over an NCHW-style feature map (reference
    setrans.py:568-619): vis+pos encode -> CrossAttFeatTrans self-attention ->
    reshape back to NHWC (unless attention-only output)."""

    cfg: SETransSiteConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        cfg = self.cfg

        attn_mask = None
        if cfg.attn_mask_radius > 0:
            ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
            coords = jnp.stack([ys, xs], axis=-1).reshape(H * W, 2)
            diff = jnp.abs(coords[None] - coords[:, None]).max(axis=-1)
            attn_mask = jnp.where(diff > cfg.attn_mask_radius, -1e9, 0.0)
            attn_mask = attn_mask[None, None].astype(jnp.float32)

        tokens, pos_biases = InputFeatEncoder(cfg, dtype=self.dtype,
                                              name="vispos_encoder")(
            x, deterministic=deterministic, return_pos_biases=True)

        out = CrossAttFeatTrans(cfg, dtype=self.dtype, name="setrans")(
            tokens, pos_biases=pos_biases, attention_mask=attn_mask,
            deterministic=deterministic)

        if not cfg.out_attn_only:
            out = out.reshape(B, H, W, C)
        return out
