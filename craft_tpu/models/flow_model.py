"""RAFT / CRAFT_nogma / CRAFT flow models (reference core/raft.py:24-146,
core/craft_nogma.py:25-203, core/network.py:26-267).

One flax module covers all three variants, driven by ModelConfig:
  * arch='raft':        plain CorrBlock + BasicUpdateBlock
  * arch='craft_nogma': TransCorrBlock (+global norm) + optional f2 transformer
                        + BasicUpdateBlock  (the reference's one-way update API,
                        fixing the latent arity bug at craft_nogma.py:165)
  * arch='craft':       TransCorrBlock + f2/f1 transformer + GMA/SETrans
                        attention + GMAUpdateBlock

TPU-native design: the refinement loop is a lax.scan (nn.scan) with
stop_gradient on coords each step (parity with coords1.detach(),
network.py:232); the correlation volume is fp32 while conv/attention compute is
bf16 under mixed precision (parity with the reference AMP islands,
network.py:179-199).  Images are NHWC uint8-range floats.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from craft_tpu.config import ModelConfig
from craft_tpu.nn.encoder import BasicEncoder
from craft_tpu.nn.gma import Attention
from craft_tpu.nn.setrans import (CrossAttFeatTrans, InputFeatEncoder,
                                  SelfAttVisPosTrans)
from craft_tpu.nn.update import BasicUpdateBlock, GMAUpdateBlock
from craft_tpu.ops.corr import (build_pyramid, corr_lookup,
                                plain_corr_pyramid, pyramid_from_level0)
from craft_tpu.ops.geometry import (convex_upsample, convex_upsample_packed,
                                    coords_grid)


class TransCorr(nn.Module):
    """Cross-frame attentional correlation volume (reference corr.py:132-207).

    Computes [B, U1, D, U2] fp32 scores via CrossAttFeatTrans with sliding
    positional biases, globally layer-normed, ready for pyramid building.
    """

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap1, fmap2, fmap1o=None, fmap2o=None,
                 deterministic: bool = True, fused_norm_dtype=None):
        """Returns [B, U1, D, U2] fp32 raw scores — or, when the caller
        granted fused_norm_dtype (see setrans.fused_norm_available), the
        [B, U1, U2] globally layer-normed volume in that dtype, ready to be
        the pyramid base."""
        B, H, W, C = fmap1.shape
        enc = InputFeatEncoder(self.cfg.inter, dtype=self.dtype,
                               name="vispos_encoder")
        setrans = CrossAttFeatTrans(self.cfg.inter, dtype=self.dtype,
                                    name="setrans")

        vispos1, pos_biases = enc(fmap1, deterministic=deterministic,
                                  return_pos_biases=True)
        vispos2 = enc(fmap2, deterministic=deterministic,
                      return_pos_biases=False)

        # Two-way (D=2) only when BOTH original maps are provided (f1trans
        # active); f2trans alone still correlates one-way (network.py:214).
        two_way = fmap1o is not None and fmap2o is not None

        def one_way(v1, v2, fused_dt=None):
            # [B, 1, U1, U2] mode-aggregated raw scores (or the fused
            # normalized [B, U1, U2] volume when fused_dt is granted).
            return setrans(v1, v2, pos_biases=pos_biases,
                           deterministic=deterministic,
                           fused_norm_dtype=fused_dt)

        if two_way:
            vispos1o = enc(fmap1o, deterministic=deterministic,
                           return_pos_biases=False)
            vispos2o = enc(fmap2o, deterministic=deterministic,
                           return_pos_biases=False)
            corr = jnp.concatenate(
                [one_way(vispos1, vispos2o), one_way(vispos1o, vispos2)],
                axis=1)  # [B, 2, U1, U2]
        elif fused_norm_dtype is not None:
            # [B, U1, U2], pre-normalized (caller checked availability).
            return one_way(vispos1, vispos2, fused_dt=fused_norm_dtype)
        else:
            corr = one_way(vispos1, vispos2)  # [B, 1, U1, U2]

        # Correlation dump hook (reference SAVECORR env hook, corr.py:180-184):
        # captured via apply(..., mutable=['intermediates']).
        self.sow("intermediates", "corr_volume", corr)
        # -> [B, U1, D, U2] fp32 for pyramid building.
        return corr.transpose(0, 2, 1, 3).astype(jnp.float32)


class FlowModel(nn.Module):
    """Unified RAFT/CRAFT forward pass."""

    cfg: ModelConfig
    train: bool = False
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, image1, image2, iters: Optional[int] = None,
                 flow_init=None, upsample_mode: str = "all"):
        """Estimate flow.  image1/image2: [B, H, W, 3] floats in [0, 255].

        Returns (flow_lowres [B,H/8,W/8,2], flows_up [iters,B,H,W,2]).

        upsample_mode: 'all' (default — one upsampled field per iteration,
        required for the training loss and test_mode=2) or 'final' — only the
        last iteration runs the upsample-mask head + convex upsampling, so
        flows_up is [1,B,H,W,2].  The reference computes every iteration's
        mask/upsample even in test mode (network.py:234-246, torch eager);
        under jit the dead per-iteration work is instead removed at trace
        time — the final field is identical up to XLA fusion reassociation
        (<=1e-5 px, tests/test_upsample_mode.py).  Param tree unchanged
        ('final' calls the same FlowHead/UpsampleMaskHead submodules).

        'packed': same per-iteration math as 'all' but flows_up is the
        lane-aligned [iters,B,H/8,W/8,128] form (convex_upsample_packed —
        bitwise the 'all' values, without the in-scan 6-D pixel shuffle whose
        minor-dim-2 relayout copies cost ~1.5-2 ms each on TPU tiles).  The
        training loss consumes it directly (sequence_loss_packed); eval
        unpacks the final frame with geometry.unpack_upsampled.
        """
        cfg = self.cfg
        iters = iters or cfg.iters
        cdt = cfg.compute_dtype
        bn_train = self.train and not self.freeze_bn
        deterministic = not self.train

        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0

        B, H, W, _ = image1.shape
        H8, W8 = H // 8, W // 8
        hdim, cdim = cfg.hidden_dim, cfg.context_dim

        # --- feature network (batch-concat trick, extractor.py:173-196) ---
        fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                            dropout=cfg.dropout, dtype=cdt, train=self.train,
                            name="fnet")
        fmaps = fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = fmaps[:B], fmaps[B:]

        # Rematerialize the attention sites when training: their [M, U, U]
        # score/prob tensors dominate activation memory (SURVEY.md §5.7);
        # recomputing them in the backward pass keeps batch-6 crops on a
        # 16 GB chip.
        # static_argnums: `deterministic` must stay a Python bool under remat
        # (arg 0 is the module itself).
        SAVPT = nn.remat(SelfAttVisPosTrans, static_argnums=(2,)) \
            if (self.train and cfg.remat_att_sites) else SelfAttVisPosTrans
        TC = nn.remat(TransCorr, static_argnums=(5,)) if self.train \
            else TransCorr

        fmap1o = fmap2o = None
        f2_module = None
        if cfg.f2trans != "none":
            f2_module = SAVPT(cfg.f2, dtype=cdt, name="f2_trans")
        if cfg.arch == "craft":
            if cfg.f1trans != "none":
                fmap1o = fmap1
                if cfg.f1trans == "shared":
                    f1_module = f2_module  # same params, applied twice
                else:
                    f1_module = SAVPT(cfg.f2, dtype=cdt, name="f1_trans")
                fmap1 = f1_module(fmap1, deterministic)
            if f2_module is not None:
                fmap2o = fmap2
                fmap2 = f2_module(fmap2, deterministic)
        elif cfg.arch == "craft_nogma" and f2_module is not None:
            fmap2 = f2_module(fmap2, deterministic)

        fmap1 = fmap1.astype(jnp.float32)
        fmap2 = fmap2.astype(jnp.float32)
        if fmap1o is not None:
            fmap1o = fmap1o.astype(jnp.float32)
            fmap2o = fmap2o.astype(jnp.float32)

        # --- context network + attention ---
        cnet = BasicEncoder(output_dim=hdim + cdim, norm_fn="batch",
                            dropout=cfg.dropout, dtype=cdt, train=bn_train,
                            name="cnet")
        cnet_feat = cnet(image1)
        net = jnp.tanh(cnet_feat[..., :hdim])
        inp = nn.relu(cnet_feat[..., hdim:])

        attention = None
        if cfg.arch == "craft":
            if cfg.use_setrans:
                attention = SAVPT(cfg.intra, dtype=cdt, name="att")(
                    inp, deterministic)  # [B, M, U, U] probs
            else:
                attention = Attention(
                    dim=cdim, max_pos_size=cfg.gma_max_pos_size,
                    heads=cfg.num_heads, dim_head=cdim,
                    position_only=cfg.position_only,
                    position_and_content=cfg.position_and_content,
                    dtype=cdt, name="att")(inp)

        # --- correlation volume (fp32 island; bf16 pyramid storage under
        # mixed precision — <5e-3 px end-to-end deviation, halves lookup
        # traffic) ---
        lvl_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        if cfg.craft:
            # Inference + bf16 levels: request the fused clamp+norm kernel
            # — the normalized volume is written once, directly as the
            # pyramid base (VERDICT r1 #8; 2.2x the unfused component at
            # batch 4 where fp32 volumes thrash HBM, and it removes the
            # big-tensor relayout copies at batch 1).  Training and
            # --fullprec keep the unfused path (autodiff via corr_vjp;
            # two-stage exact stats).  The decision is static here so the
            # remat'd TransCorr has one output shape.
            from craft_tpu.nn.setrans import fused_norm_available
            prenormed = (deterministic and cfg.mixed_precision
                         and not (cfg.f1trans != "none"
                                  and cfg.arch == "craft")
                         and not self.is_mutable_collection("intermediates")
                         and fused_norm_available(cfg.inter, H8, W8,
                                                  deterministic))
            tc_mod = TC(cfg, dtype=cdt, name="corr_fn")
            if prenormed:  # inference only — TC is not remat'd here
                vol = tc_mod(fmap1, fmap2, fmap1o, fmap2o, deterministic,
                             lvl_dtype)
            else:
                vol = tc_mod(fmap1, fmap2, fmap1o, fmap2o, deterministic)
            if prenormed:
                pyramid = pyramid_from_level0(vol, B, H8, W8,
                                              cfg.corr_levels,
                                              cfg.corr_radius,
                                              level_dtype=lvl_dtype)
            else:
                pyramid = build_pyramid(vol, B, H8, W8, cfg.corr_levels,
                                        cfg.corr_radius, do_global_norm=True,
                                        level_dtype=lvl_dtype)
        else:
            # Correlation dump hook for the plain volume too (the reference
            # SAVECORR works for RAFT/GMA as well, corr.py:35-40).  sow is a
            # no-op unless 'intermediates' is mutable, so this costs nothing
            # in normal runs.
            if self.is_mutable_collection("intermediates"):
                from craft_tpu.ops.corr import all_pairs_correlation
                self.sow("intermediates", "corr_volume",
                         all_pairs_correlation(fmap1, fmap2)[:, None])
            pyramid = plain_corr_pyramid(fmap1, fmap2, cfg.corr_levels,
                                         cfg.corr_radius,
                                         level_dtype=lvl_dtype)

        # --- iterative refinement: lax.scan over the update block ---
        coords0 = coords_grid(B, H8, W8)
        coords1 = coords_grid(B, H8, W8)
        if flow_init is not None:
            coords1 = coords1 + flow_init

        if cfg.arch == "craft":
            update_block = GMAUpdateBlock(cfg, dtype=cdt, name="update_block")
        else:
            update_block = BasicUpdateBlock(cfg, dtype=cdt, name="update_block")
        # The context features' GRU gate contribution is iteration-invariant:
        # precompute it once here instead of convolving `inp` on every scan
        # step (~25% of the in-loop GRU MACs; see nn/update.py docstring).
        gru_static = update_block.precompute_gru_static(inp.astype(cdt))

        final_only = upsample_mode == "final"
        packed = upsample_mode == "packed"

        def step(mdl, carry, _):
            net, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_lookup(pyramid, coords1)
            flow = coords1 - coords0
            # NOTE: the mask head stays in the body even under 'final':
            # its conv1 is merged with FlowHead's (_merged_heads), and the
            # then-unused mask outputs are DCE'd by XLA.
            if cfg.arch == "craft":
                net, up_mask, delta = update_block(
                    net, inp, corr.astype(cdt), flow.astype(cdt), attention,
                    gru_static=gru_static)
            else:
                net, up_mask, delta = update_block(
                    net, inp, corr.astype(cdt), flow.astype(cdt),
                    gru_static=gru_static)
            coords1 = coords1 + delta.astype(jnp.float32)
            if final_only:
                return (net, coords1), None
            up_fn = convex_upsample_packed if packed else convex_upsample
            flow_up = up_fn((coords1 - coords0), up_mask.astype(jnp.float32))
            return (net, coords1), flow_up

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": False},
                       length=iters, unroll=cfg.scan_unroll)
        (net, coords1), flows_up = scan(self, (net, coords1), None)

        if final_only:
            up_mask = update_block.upsample_mask(net)
            flow_up = convex_upsample((coords1 - coords0),
                                      up_mask.astype(jnp.float32))
            flows_up = flow_up[None]

        return coords1 - coords0, flows_up


def create_model(cfg: ModelConfig, train: bool = False,
                 freeze_bn: bool = False) -> FlowModel:
    return FlowModel(cfg=cfg, train=train, freeze_bn=freeze_bn)
