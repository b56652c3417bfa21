"""Typed configuration for the CRAFT-TPU model zoo.

The reference (askerlee/craft) routes all configuration through a single argparse
Namespace that is mutated at model-construction time (reference: core/network.py:44-130,
core/setrans.py:71-157).  Here every attention site gets its own frozen dataclass with
the reference defaults baked in, and `ModelConfig` composes them.  A flat CLI that
mirrors the reference flag names lives in `craft_tpu/cli.py`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp


@dataclass(frozen=True)
class SETransSiteConfig:
    """Config for one attention site (inter / f2 / intra).

    Mirrors the fields of the reference ``SETransConfig`` (setrans.py:71-157) that are
    actually consumed by the model, with the per-site overrides from network.py baked
    into the three constructors below.
    """

    in_feat_dim: int = 256
    feat_dim: int = 256
    num_modes: int = 4
    # 'shared' ties the K projection to Q (single parameter, used twice);
    # None/'none' keeps independent Q and K.
    tie_qk_scheme: Optional[str] = "shared"
    qk_have_bias: bool = False
    v_has_bias: bool = False
    attn_clip: float = 100.0
    base_initializer_range: float = 0.02
    query_idbias_scale: float = 10.0
    feattrans_lin1_idbias_scale: float = 10.0
    pos_code_type: str = "bias"  # 'bias' | 'lsinu' | 'sinu' | 'rand' | 'zero'
    pos_code_weight: float = 1.0
    pos_bias_radius: int = 7
    # Output selector: exactly one of these may be True.
    out_attn_scores_only: bool = False  # inter-frame correlation site
    out_attn_probs_only: bool = False   # intra-frame attention site
    # ExpandedFeatTrans options (feature-output sites only).
    has_FFN: bool = True
    has_input_skip: bool = False
    trans_output_type: str = "private"  # 'private' | 'shared'
    pool_modes_feat: str = "softmax"    # 'softmax' | 'max' | 'mean' | 'none'
    ablate_multihead: bool = False
    # Local attention mask radius in 1/8-res cells (<=0 disables); f2 only.
    attn_mask_radius: int = -1
    # Pallas fused-attention kernels: 'auto' (TPU + inference), 'on', 'off'.
    use_pallas: str = "auto"
    # Materialized-probs storage for the probs-only (intra) site at
    # inference: int8 fixed-point (p*127) halves the HBM bytes the
    # per-iteration aggregate streams.  Only affects the Pallas serving
    # path; accuracy bound tested vs the bf16 path.
    quantize_probs: bool = False
    # Dropout (reference defaults setrans.py:110-111).
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.2
    drop_path_prob: float = 0.0  # stochastic depth (off by default)

    @property
    def mode_dim(self) -> int:
        return self.in_feat_dim // self.num_modes

    @property
    def out_attn_only(self) -> bool:
        return self.out_attn_scores_only or self.out_attn_probs_only


def inter_corr_config(
    num_modes: int = 4,
    qk_have_bias: bool = True,
    pos_code_type: str = "bias",
    pos_code_weight: float = 0.5,
    pos_bias_radius: int = 7,
) -> SETransSiteConfig:
    """Inter-frame attentional-correlation site (reference network.py:44-61)."""
    return SETransSiteConfig(
        in_feat_dim=256,
        feat_dim=256,
        num_modes=num_modes,
        tie_qk_scheme="shared",
        qk_have_bias=qk_have_bias,
        pos_code_type=pos_code_type,
        pos_code_weight=pos_code_weight,
        pos_bias_radius=pos_bias_radius,
        out_attn_scores_only=True,
        has_FFN=False,
        has_input_skip=False,
    )


def f2_trans_config(
    num_modes: int = 4,
    pos_code_type: str = "bias",
    pos_code_weight: float = 0.5,
    pos_bias_radius: int = 7,
    attn_mask_radius: int = -1,
) -> SETransSiteConfig:
    """F2 semantic-smoothing self-attention site (reference network.py:67-92)."""
    return SETransSiteConfig(
        in_feat_dim=256,
        feat_dim=256,
        num_modes=num_modes,
        tie_qk_scheme=None,
        qk_have_bias=False,
        pos_code_type=pos_code_type,
        pos_code_weight=pos_code_weight,
        pos_bias_radius=pos_bias_radius,
        has_FFN=False,
        has_input_skip=True,
        attn_mask_radius=attn_mask_radius,
    )


def intra_attn_config(
    num_modes: int = 4,
    pos_code_type: str = "bias",
    pos_code_weight: float = 1.0,
    pos_bias_radius: int = 7,
) -> SETransSiteConfig:
    """Intra-frame (--setrans) attention site (reference network.py:108-128)."""
    return SETransSiteConfig(
        in_feat_dim=128,
        feat_dim=128,
        num_modes=num_modes,
        tie_qk_scheme=None,
        qk_have_bias=False,
        pos_code_type=pos_code_type,
        pos_code_weight=pos_code_weight,
        pos_bias_radius=pos_bias_radius,
        out_attn_probs_only=True,
        has_FFN=False,
        has_input_skip=True,
        attn_mask_radius=-1,
    )


def intra_aggregator_config(cfg: SETransSiteConfig) -> SETransSiteConfig:
    """The motion aggregator reuses the intra config but consumes probs it is given
    (reference update.py:129-135): same dims, feature output."""
    return dataclasses.replace(cfg, out_attn_probs_only=False, out_attn_scores_only=False)


@dataclass(frozen=True)
class ModelConfig:
    """Top-level model configuration (mirrors the reference CLI surface)."""

    # Which model family: 'raft' | 'craft_nogma' | 'craft'
    arch: str = "craft"
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12

    # CRAFT switches (reference train.py:316-404 defaults).
    craft: bool = True                 # TransCorrBlock vs plain CorrBlock
    f2trans: str = "full"              # 'none' | 'full' | 'half'
    f1trans: str = "none"              # 'none' | 'shared' | 'private'
    use_setrans: bool = True           # SETrans intra attention vs GMA attention
    num_heads: int = 1                 # GMA attention heads
    position_only: bool = False
    position_and_content: bool = False
    gma_max_pos_size: int = 160

    inter: SETransSiteConfig = field(default_factory=inter_corr_config)
    f2: SETransSiteConfig = field(default_factory=f2_trans_config)
    intra: SETransSiteConfig = field(default_factory=intra_attn_config)

    dropout: float = 0.0               # fnet/cnet Dropout2d rate
    mixed_precision: bool = True       # bf16 compute islands (fp32 correlation)
    # lax.scan unroll factor for the refinement loop: >1 lets XLA overlap /
    # fuse across iterations at the cost of compile time + code size.
    scan_unroll: int = 1
    # Rematerialize the f2/intra attention sites in training.  With the
    # probs_vjp training path (bf16 Pallas probs + closed-form backward) the
    # stored activation is only the bf16 probs tensor, so turning remat OFF
    # trades ~260 MB/site (chairs crops) for skipping the full site
    # recompute in the backward pass.
    remat_att_sites: bool = True
    # Layout of the per-iteration convex-upsampled flows: 'all' (one
    # [B, 8H, 8W, 2] field per iteration — reference semantics), 'packed'
    # (keep the [B, H, W, 128] pixel-shuffle-free layout; unpack at the
    # consumer), 'final' (upsample only after the scan; saves 200+ MB on
    # 1088x1920 SP frames).  All three are value-identical
    # (tests/test_upsample_mode.py).  Serving default 'all': the round-5
    # same-session interleaved A/B measured 23.49 fps ('all') vs 20.90
    # ('packed') at 436x1024 — BENCH_NOTES "round 5: packed vs all".
    upsample_mode: str = "all"

    @property
    def corr_multiplier(self) -> int:
        return 2 if (self.f1trans != "none" and self.arch == "craft") else 1

    @property
    def cor_planes(self) -> int:
        return self.corr_levels * self.corr_multiplier * (2 * self.corr_radius + 1) ** 2

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mixed_precision else jnp.float32

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def raft_config(mixed_precision: bool = True, corr_radius: int = 4) -> ModelConfig:
    return ModelConfig(
        arch="raft", craft=False, f2trans="none", f1trans="none", use_setrans=False,
        corr_radius=corr_radius, mixed_precision=mixed_precision,
    )


def gma_config(mixed_precision: bool = True, num_heads: int = 1) -> ModelConfig:
    """GMA baseline: plain correlation + GMA attention + GMAUpdateBlock
    (reference train-gma.sh; 5.88 M params)."""
    return ModelConfig(
        arch="craft", craft=False, f2trans="none", f1trans="none",
        use_setrans=False, num_heads=num_heads,
        mixed_precision=mixed_precision,
    )


def craft_nogma_config(mixed_precision: bool = True, f2trans: str = "full") -> ModelConfig:
    # craft_nogma.py:77 uses intra_num_modes for the f2 site's mode count.
    return ModelConfig(
        arch="craft_nogma", craft=True, f2trans=f2trans, f1trans="none",
        use_setrans=False, mixed_precision=mixed_precision,
    )


def craft_config(
    mixed_precision: bool = True,
    use_setrans: bool = True,
    f2trans: str = "full",
    f1trans: str = "none",
) -> ModelConfig:
    # int8 fixed-point intra probs ride with mixed precision (the production
    # serving config): +1 fps at Sintel size, 0.019 px max / 0.004 px mean
    # flow deviation vs the bf16-probs path (BENCH_NOTES round 3).  --fullprec
    # keeps exact bf16/fp32 probs.
    intra = intra_attn_config()
    if mixed_precision:
        intra = dataclasses.replace(intra, quantize_probs=True)
    return ModelConfig(
        arch="craft", craft=True, f2trans=f2trans, f1trans=f1trans,
        use_setrans=use_setrans, mixed_precision=mixed_precision,
        intra=intra,
    )
