"""Evaluation / submission / demo CLI (reference evaluate.py:1418-1653).

Loads a checkpoint (PyTorch .pth via the converter, or a native orbax dir),
then runs validate_* / submissions / shift sweeps / single-pair demo.

Examples:
  python -m craft_tpu.evaluate --model checkpoints/craft-sintel.pth --craft \
      --setrans --f2 full --dataset sintel
  python -m craft_tpu.evaluate --model ... --dataset sintel \
      --xshifts 100,200,300 --yshifts 50,100,150          # shift robustness
  python -m craft_tpu.evaluate --model ... --img1 a.png --img2 b.png
  python -m craft_tpu.evaluate --model craft-chairs.pth --convert out_dir
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from craft_tpu.cli import add_model_args, model_config_from_args


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".pth or orbax checkpoint")
    p.add_argument("--model_name", default="craft")
    add_model_args(p)
    p.add_argument("--dataset", default=None,
                   choices=[None, "chairs", "things", "sintel", "kitti",
                            "kittitrain", "hd1k", "viper", "slowflow"])
    p.add_argument("--submission", default=None,
                   choices=[None, "sintel", "kitti", "viper"])
    p.add_argument("--warm_start", action="store_true",
                   help="Sintel submission warm start")
    p.add_argument("--output_path", default=None)
    p.add_argument("--vis", dest="do_vis", action="store_true")
    p.add_argument("--img1", default=None)
    p.add_argument("--img2", default=None)
    p.add_argument("--flow", dest="flow_path", default=None)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--flop", dest="calc_flop", action="store_true")
    p.add_argument("--xshifts", type=str, default=None,
                   help="comma list of x shifts for the robustness sweep")
    p.add_argument("--yshifts", type=str, default=None)
    p.add_argument("--max_val_count", type=int, default=-1)
    p.add_argument("--test_mode", type=int, default=1, choices=[1, 2],
                   help="2 = per-iteration EPE curves on dense sets "
                        "(reference evaluate.py:317-323)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="batch consecutive same-shape pairs (dense sets)")
    p.add_argument("--data_root", type=str, default="datasets")
    p.add_argument("--convert", default=None, metavar="OUT_DIR",
                   help="convert the .pth to a native orbax checkpoint "
                        "(the analog of the reference --fix upgrader, "
                        "evaluate.py:1386-1416)")
    # Reference default: eval with --mixed_precision ON unless --fullprec
    # (which here also forces exact fp32 matmuls for strict parity).
    p.add_argument("--fullprec", dest="fullprec", action="store_true")
    p.add_argument("--seq_parallel", action="store_true",
                   help="shard the token axis of the attention/correlation "
                        "tensors over all devices (big-frame scale-out; "
                        "replaces the reference's half-res workaround, "
                        "reference evaluate.py:211-220)")
    args = p.parse_args(argv)
    if not args.fullprec:
        args.mixed_precision = True
    return args


def load_variables(args, cfg):
    import jax
    import jax.numpy as jnp

    from craft_tpu.models.flow_model import FlowModel

    model = FlowModel(cfg=cfg, train=False)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)

    if args.model.endswith(".pth"):
        from craft_tpu.utils.torch_convert import convert_checkpoint
        variables, report = convert_checkpoint(args.model, cfg, variables,
                                               strict=False)
        if report["missing"]:
            print(f"WARNING: {len(report['missing'])} leaves unmatched "
                  f"(strict=False, reference load_state_dict(strict=False) "
                  f"parity)")
    else:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.abspath(
            os.path.join(args.model, "model")))
        variables = {"params": payload["params"]}
        if payload.get("batch_stats"):
            variables["batch_stats"] = payload["batch_stats"]
    return variables


def main(argv=None):
    args = parse_args(argv)
    from craft_tpu.utils.jax_setup import setup_jax
    jax = setup_jax()
    if args.fullprec:
        # Strict-parity mode: fp32 everywhere AND exact fp32 matmuls (the TPU
        # default decomposes f32 matmuls into bf16 passes; 'highest' brings
        # the compiled model to ~3e-5 max flow deviation vs the fp32 torch
        # reference — tools/verify_tpu.py).
        jax.config.update("jax_default_matmul_precision", "highest")

    cfg = model_config_from_args(args)
    variables = load_variables(args, cfg)

    if args.seq_parallel:
        from craft_tpu.eval.evaluate import set_default_seq_parallel
        set_default_seq_parallel(True)

    if args.convert:
        import orbax.checkpoint as ocp
        import jax
        ckptr = ocp.PyTreeCheckpointer()
        payload = {"step": np.zeros((), np.int32),
                   "params": jax.tree.map(np.asarray, variables["params"]),
                   "batch_stats": jax.tree.map(
                       np.asarray, variables.get("batch_stats", {}))}
        ckptr.save(os.path.abspath(os.path.join(args.convert, "model")),
                   payload, force=True)
        print(f"Converted {args.model} -> {args.convert}")
        return

    if args.img1 and args.img2:
        from craft_tpu.eval.demo import gen_flow
        gen_flow(cfg, variables, args.img1, args.img2, args.flow_path,
                 iters=args.iters, model_name=args.model_name,
                 scale=args.scale, calc_flop=args.calc_flop)
        return

    if args.submission:
        from craft_tpu.eval import submission
        out = args.output_path or f"{args.submission}_submission"
        if args.submission == "sintel":
            submission.create_sintel_submission(
                cfg, variables, args.model_name, args.data_root,
                warm_start=args.warm_start, output_path=out, iters=32,
                do_vis=args.do_vis)
        elif args.submission == "kitti":
            submission.create_kitti_submission(
                cfg, variables, args.model_name, args.data_root,
                output_path=out, iters=24, do_vis=args.do_vis)
        else:
            submission.create_viper_submission(
                cfg, variables, args.model_name, args.data_root,
                output_path=out, iters=24, do_vis=args.do_vis)
        return

    if args.dataset:
        from craft_tpu.eval.evaluate import VALIDATORS
        fn = VALIDATORS[args.dataset]
        extra = {}
        if args.dataset == "sintel" and args.batch_size > 1:
            extra["batch_size"] = args.batch_size
        if args.test_mode != 1:
            if args.dataset in ("sintel", "things", "slowflow"):
                extra["test_mode"] = args.test_mode
            else:
                print(f"--test_mode {args.test_mode} only applies to dense "
                      "sets (sintel/things/slowflow); ignoring")
        if args.xshifts or args.yshifts:
            xs = [int(v) for v in (args.xshifts or "0").split(",")]
            ys = [int(v) for v in (args.yshifts or "0").split(",")]
            for dx, dy in zip(xs, ys):
                print(f"=== shift ({dx}, {dy}) ===")
                fn(cfg, variables, iters=args.iters,
                   data_root=args.data_root, xy_shift=(dx, dy),
                   max_val_count=args.max_val_count, **extra)
        else:
            fn(cfg, variables, iters=args.iters, data_root=args.data_root,
               max_val_count=args.max_val_count, **extra)
        return

    print("Nothing to do: pass --dataset, --submission, or --img1/--img2")


if __name__ == "__main__":
    main()
