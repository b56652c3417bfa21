"""Flat CLI mirroring the reference flag surface (reference train.py:311-404,
train_ddp.py:330-424, evaluate.py:1419-1513 — one canonical parser, resolving
the reference's cross-file flag drift in favor of train.py defaults)."""

from __future__ import annotations

import argparse

from craft_tpu.config import (ModelConfig, f2_trans_config, inter_corr_config,
                              intra_attn_config)


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--craft", action="store_true",
                   help="use CRAFT (cross-attentional correlation)")
    p.add_argument("--setrans", dest="use_setrans", action="store_true",
                   help="use SETrans intra-frame attention (vs GMA)")
    p.add_argument("--raft", action="store_true", help="RAFT baseline")
    p.add_argument("--nogma", action="store_true", help="CRAFT without GMA")
    p.add_argument("--radius", dest="corr_radius", type=int, default=4)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--mixed_precision", action="store_true", default=False)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--num_heads", default=1, type=int)
    p.add_argument("--position_only", default=False, action="store_true")
    p.add_argument("--position_and_content", default=False,
                   action="store_true")
    p.add_argument("--posr", dest="pos_bias_radius", type=int, default=7)
    p.add_argument("--f1", dest="f1trans", type=str,
                   choices=["none", "shared", "private"], default="none")
    p.add_argument("--f2", dest="f2trans", type=str,
                   choices=["none", "full", "half"], default="full")
    p.add_argument("--f2posw", dest="f2_pos_code_weight", type=float,
                   default=0.5)
    p.add_argument("--f2radius", dest="f2_attn_mask_radius", type=int,
                   default=-1)
    p.add_argument("--intermodes", dest="inter_num_modes", type=int, default=4)
    p.add_argument("--intramodes", dest="intra_num_modes", type=int, default=4)
    p.add_argument("--f2modes", dest="f2_num_modes", type=int, default=4)
    p.add_argument("--interqknobias", dest="inter_qk_have_bias",
                   action="store_false")
    p.add_argument("--interpos", dest="inter_pos_code_type", type=str,
                   choices=["lsinu", "bias"], default="bias")
    p.add_argument("--interposw", dest="inter_pos_code_weight", type=float,
                   default=0.5)
    p.add_argument("--intrapos", dest="intra_pos_code_type", type=str,
                   choices=["lsinu", "bias"], default="bias")
    p.add_argument("--intraposw", dest="intra_pos_code_weight", type=float,
                   default=1.0)
    p.add_argument("--upsample_mode", type=str,
                   choices=["all", "packed", "final"], default="all",
                   help="convex-upsample output layout (value-identical; "
                        "'all' measured fastest on TPU serving — BENCH_NOTES "
                        "round 5; 'final' saves 200+ MB on big SP frames)")


def model_config_from_args(args) -> ModelConfig:
    if args.f2trans == "half":
        # The reference accepts --f2 half but the path is vestigial: it sets
        # f2_trans_config.do_half_attn (craft_nogma.py:64) which
        # SelfAttVisPosTrans never reads, so 'half' silently behaves as
        # 'full'.  Reject rather than replicate the silent no-op.
        raise SystemExit(
            "--f2 half is not supported: in the reference it is a no-op "
            "(do_half_attn is set at craft_nogma.py:64 but never read by "
            "setrans.py). Use --f2 full or --f2 none.")
    if args.raft:
        arch, craft, f2trans, use_setrans = "raft", False, "none", False
    elif args.nogma:
        arch, craft = "craft_nogma", True
        f2trans, use_setrans = args.f2trans, False
    else:
        arch, craft = "craft", True
        f2trans, use_setrans = args.f2trans, args.use_setrans

    inter = inter_corr_config(
        num_modes=args.inter_num_modes,
        qk_have_bias=args.inter_qk_have_bias,
        pos_code_type=args.inter_pos_code_type,
        pos_code_weight=args.inter_pos_code_weight,
        pos_bias_radius=args.pos_bias_radius)
    # craft_nogma uses intra_num_modes for f2 (craft_nogma.py:77).
    f2_modes = args.intra_num_modes if arch == "craft_nogma" \
        else args.f2_num_modes
    f2 = f2_trans_config(
        num_modes=f2_modes,
        pos_code_type=args.intra_pos_code_type,
        pos_code_weight=args.f2_pos_code_weight,
        pos_bias_radius=args.pos_bias_radius,
        attn_mask_radius=args.f2_attn_mask_radius)
    intra = intra_attn_config(
        num_modes=args.intra_num_modes,
        pos_code_type=args.intra_pos_code_type,
        pos_code_weight=args.intra_pos_code_weight,
        pos_bias_radius=args.pos_bias_radius)
    if args.mixed_precision:
        # int8 fixed-point intra probs ride with mixed precision (serving
        # config; inference-only path) — see config.craft_config.
        import dataclasses
        intra = dataclasses.replace(intra, quantize_probs=True)

    return ModelConfig(
        arch=arch, craft=craft, f2trans=f2trans, f1trans=args.f1trans,
        use_setrans=use_setrans, corr_radius=args.corr_radius,
        iters=args.iters, num_heads=args.num_heads,
        position_only=args.position_only,
        position_and_content=args.position_and_content,
        inter=inter, f2=f2, intra=intra, dropout=args.dropout,
        mixed_precision=args.mixed_precision,
        upsample_mode=getattr(args, "upsample_mode", "all"))
