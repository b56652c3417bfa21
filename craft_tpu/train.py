"""Training CLI (reference train.py + train_ddp.py folded into one pjit
trainer; reference train.py:177-254, train_ddp.py:185-280).

Single program covers single-chip and multi-chip: the batch is sharded over a
'data' mesh of all local (and, with jax.distributed, global) devices; params
are replicated; XLA inserts the gradient all-reduce (DDP parity, no NCCL).

Example (chairs stage, mirrors train-craft-f2full.sh):
  python -m craft_tpu.train --name craft-chairs --stage chairs --craft \
      --setrans --f2 full --mixed_precision --lr 2.5e-4 --num_steps 120000 \
      --image_size 368 496 --batch_size 8 --val_freq 20000
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from craft_tpu.cli import add_model_args, model_config_from_args


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="craft")
    p.add_argument("--stage", required=True,
                   choices=["chairs", "things", "sintel", "kitti",
                            "kittitrain", "viper", "autoflow"])
    add_model_args(p)
    p.add_argument("--validation", type=str, nargs="+", default=[])
    p.add_argument("--restore_ckpt", default=None)
    p.add_argument("--loadopt", dest="load_optimizer_state",
                   action="store_true")
    p.add_argument("--loadsched", dest="load_scheduler_state",
                   action="store_true")
    p.add_argument("--output", type=str, default="checkpoints")
    p.add_argument("--lr", type=float, default=0.00002)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=6,
                   help="per-process batch (global = batch * n_processes, "
                        "DDP parity)")
    p.add_argument("--workers", dest="num_workers", type=int, default=4)
    p.add_argument("--loader_backend", choices=("process", "thread"),
                   default="process",
                   help="prefetch backend: forked worker processes "
                        "(reference DataLoader parity) or GIL-bound threads")
    p.add_argument("--image_size", type=int, nargs="+", default=[384, 512])
    p.add_argument("--wdecay", type=float, default=0.00005)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--shiftprob", dest="shift_aug_prob", type=float,
                   default=0.0)
    p.add_argument("--shiftsigmas", dest="shift_sigmas", default="16,10",
                   type=str)
    p.add_argument("--freeze_bn", action="store_true")
    p.add_argument("--val_freq", type=int, default=10000)
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--attn_diag", action="store_true",
                   help="every print_freq-th step runs with attention-health "
                        "telemetry (max_attn / clamp_frac / avg_abs_attn) "
                        "folded into the metrics (reference setrans.py "
                        "periodic prints)")
    p.add_argument("--data_root", type=str, default="datasets")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for steps [10, 10+N)")
    p.add_argument("--profile_dir", type=str, default="/tmp/craft_tpu_trace")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    args.shift_sigmas = tuple(int(s) for s in args.shift_sigmas.split(","))
    os.makedirs(args.output, exist_ok=True)

    from craft_tpu.utils.jax_setup import setup_jax
    jax = setup_jax()

    from craft_tpu.data.datasets import fetch_training_dataset
    from craft_tpu.data.loader import (InfiniteLoader, MultiprocessLoader,
                                       ShardedLoader)
    from craft_tpu.parallel.mesh import (initialize_distributed,
                                         make_data_mesh, replicate_state,
                                         shard_batch)
    from craft_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from craft_tpu.training.logger import Logger
    from craft_tpu.training.train_step import (create_train_state,
                                               make_train_step)

    initialize_distributed()
    cfg = model_config_from_args(args)

    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    # Freeze BN on every stage after chairs (reference train.py:198-199).
    freeze_bn = args.freeze_bn and args.stage != "chairs"

    state, tx, _ = create_train_state(
        cfg, rng, image_shape=tuple(args.image_size), lr=args.lr,
        num_steps=args.num_steps, wdecay=args.wdecay, epsilon=args.epsilon,
        clip=args.clip)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Parameter Count: {n_params}")

    # Host-side twin of the device LR schedule: calling `schedule(step)` from
    # the loop would dispatch + block on a device scalar every step.
    from craft_tpu.training.optim import onecycle_linear_host
    host_lr = onecycle_linear_host(args.lr, args.num_steps + 100)

    logger = Logger(args.num_steps, args.print_freq, args.output)
    if args.restore_ckpt:
        state, logger_state = load_checkpoint(
            args.restore_ckpt, state,
            load_optimizer_state=args.load_optimizer_state,
            load_scheduler_state=args.load_scheduler_state,
            load_logger=args.load_scheduler_state)
        if logger_state:
            logger.load_state_dict(logger_state)

    # Training supports 'all'/'packed' only ('final' is a serving/SP memory
    # knob); map it to 'packed', the closest training layout.
    train_upsample = cfg.upsample_mode if cfg.upsample_mode != "final" \
        else "packed"
    train_step = make_train_step(cfg, tx, iters=args.iters, gamma=args.gamma,
                                 freeze_bn=freeze_bn,
                                 upsample_mode=train_upsample)
    from craft_tpu.utils.jax_setup import train_compiler_options
    train_step = jax.jit(train_step, donate_argnums=(0,),
                         compiler_options=train_compiler_options())
    diag_step = None
    if args.attn_diag:
        # Second compiled step with the 'diagnostics' collection mutable
        # (XLA attention path); used every print_freq-th step so the fast
        # fused-kernel step keeps doing the bulk of the work.
        diag_step = make_train_step(cfg, tx, iters=args.iters,
                                    gamma=args.gamma, freeze_bn=freeze_bn,
                                    attn_diag=True,
                                    upsample_mode=train_upsample)
        diag_step = jax.jit(diag_step, donate_argnums=(0,),
                            compiler_options=train_compiler_options())

    dataset = fetch_training_dataset(
        args.stage, tuple(args.image_size), shift_prob=args.shift_aug_prob,
        shift_sigmas=args.shift_sigmas, data_root=args.data_root)
    print(f"Training with {len(dataset)} image pairs")

    # Per-process batch stays --batch_size; it shards across local devices.
    # Use the largest device count that divides the batch.
    n_dev = len(jax.devices())
    while args.batch_size % n_dev != 0:
        n_dev -= 1
    if n_dev != len(jax.devices()):
        print(f"Using {n_dev}/{len(jax.devices())} devices "
              f"(batch {args.batch_size} divisibility)")
    mesh = make_data_mesh(jax.devices()[:n_dev])
    # Worker *processes* (reference datasets.py:576-577 num_workers=4):
    # PIL + the numpy aug chain hold the GIL, so threads cannot scale decode.
    loader_cls = ShardedLoader if args.loader_backend == "thread" \
        else MultiprocessLoader
    loader = loader_cls(dataset, args.batch_size,
                        num_workers=args.num_workers,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        seed=args.seed)

    state = replicate_state(mesh, state)
    step_rng = jax.random.PRNGKey(args.seed + 7)

    is_main = jax.process_index() == 0
    noise_rng = np.random.RandomState(args.seed + 13)
    t_prev = time.time()
    step = int(jax.device_get(state.step))
    for batch in InfiniteLoader(loader):
        if args.add_noise:
            stdv = noise_rng.uniform(0.0, 5.0)
            for k in ("image1", "image2"):
                batch[k] = np.clip(
                    batch[k] + stdv * noise_rng.randn(*batch[k].shape),
                    0.0, 255.0).astype(np.float32)
        batch.pop("extra_info", None)
        batch = shard_batch(mesh, batch)
        if args.profile_steps and step == 10:
            import jax.profiler
            jax.profiler.start_trace(args.profile_dir)
        use_diag = diag_step is not None and step % args.print_freq == 0
        state, metrics = (diag_step if use_diag else train_step)(
            state, batch, step_rng)
        step += 1
        if args.profile_steps and step == 10 + args.profile_steps:
            import jax.profiler
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {args.profile_dir}")
        # Metrics stay on-device; the logger materializes them lazily at
        # print_freq so the loop never blocks on a device->host transfer and
        # steps dispatch asynchronously.
        t_now = time.time()
        metrics["time"] = t_now - t_prev
        t_prev = t_now
        if is_main:
            logger.push(metrics, host_lr(step))

        if step % args.val_freq == args.val_freq - 1 and is_main:
            path = os.path.join(args.output, f"{step + 1}_{args.name}")
            save_checkpoint(path, jax.device_get(state), logger.state_dict())
            _run_validation(args, cfg, state, logger)
            logger.plot_train()
            logger.plot_val()

        if step >= args.num_steps:
            break

    if is_main:
        path = os.path.join(args.output, args.name)
        save_checkpoint(path, jax.device_get(state), logger.state_dict())
        logger.plot_train()
        logger.plot_val()


def _run_validation(args, cfg, state, logger):
    from craft_tpu.eval.evaluate import VALIDATORS
    import jax

    variables = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    results = {}
    for name in args.validation:
        fn = VALIDATORS.get(name)
        if fn is None:
            print(f"unknown validation set {name}")
            continue
        try:
            results.update(fn(cfg, variables, iters=args.iters,
                              data_root=args.data_root))
        except FileNotFoundError as e:
            print(f"validation {name} skipped: {e}")
    logger.push_validation(results)


if __name__ == "__main__":
    main()
