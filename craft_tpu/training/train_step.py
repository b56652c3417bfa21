"""The jitted data-parallel training step (reference train.py:213-254 semantics).

State = params + batch_stats + optimizer state.  The step:
  forward (12-iteration refinement) -> sequence loss -> grad -> global-norm
  clip -> AdamW update, all inside one jit; with the batch sharded over the
  'data' mesh axis and params replicated, XLA inserts the gradient all-reduce
  over ICI (DDP parity without NCCL).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from craft_tpu.config import ModelConfig
from craft_tpu.models.flow_model import FlowModel
from craft_tpu.training.loss import sequence_loss, sequence_loss_packed
from craft_tpu.training.optim import make_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg: ModelConfig, rng, image_shape=(368, 496),
                       lr: float = 2.5e-4, num_steps: int = 100000,
                       wdecay: float = 5e-5, epsilon: float = 1e-8,
                       clip: float = 1.0) -> Tuple[TrainState, Any, Any]:
    """Initialize model + optimizer.  Returns (state, tx, schedule)."""
    model = FlowModel(cfg=cfg, train=False)
    H, W = image_shape
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(rng, dummy, dummy, iters=1)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx, schedule = make_optimizer(lr, num_steps, wdecay, epsilon, clip)
    opt_state = tx.init(params)
    return (TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state),
            tx, schedule)


def _summarize_attn_diag(diag) -> Dict[str, jnp.ndarray]:
    """Reduce the sown 'diagnostics' collection (per-attention-site max_attn /
    clamp_frac / avg_abs_attn scalars) to three global metrics — the jit-safe
    analog of the reference's periodic max-attn/clamp-count prints
    (setrans.py:520-536)."""
    buckets: Dict[str, list] = {"max_attn": [], "clamp_frac": [],
                                "avg_abs_attn": []}
    for path, leaf in jax.tree_util.tree_flatten_with_path(diag)[0]:
        name = jax.tree_util.keystr(path)
        for key, vals in buckets.items():
            if key in name:
                vals.append(jnp.asarray(leaf, jnp.float32))
    out = {}
    if buckets["max_attn"]:
        out["attn_max"] = jnp.max(jnp.stack(buckets["max_attn"]))
    if buckets["clamp_frac"]:
        out["attn_clamp_frac"] = jnp.mean(jnp.stack(buckets["clamp_frac"]))
    if buckets["avg_abs_attn"]:
        out["attn_avg_abs"] = jnp.mean(jnp.stack(buckets["avg_abs_attn"]))
    return out


def make_train_step(cfg: ModelConfig, tx, iters: int = 12, gamma: float = 0.8,
                    freeze_bn: bool = False, attn_diag: bool = False,
                    upsample_mode: str = None):
    """Build the jittable train step fn(state, batch, rng) -> (state, metrics).

    batch: dict(image1 [B,H,W,3], image2, flow [B,H,W,2], valid [B,H,W]).
    attn_diag: run with the 'diagnostics' collection mutable and fold the
    attention-health telemetry into metrics.  This forces the XLA attention
    path (the fused probs kernel never materializes scores), so the trainer
    compiles it as a *second* step used every print_freq-th iteration.
    upsample_mode: 'all' or 'packed' (value-identical; 'packed' keeps the
    per-iteration predictions in the lane-aligned [iters, B, H/8, W/8, 128]
    layout through the scan and packs the ground truth once in the loss —
    sequence_loss_packed).  None -> cfg.upsample_mode.
    """
    model = FlowModel(cfg=cfg, train=True, freeze_bn=freeze_bn)
    if upsample_mode is None:
        upsample_mode = cfg.upsample_mode
    if upsample_mode not in ("all", "packed"):
        raise ValueError(f"train upsample_mode must be 'all' or 'packed', "
                         f"got {upsample_mode!r}")
    loss_impl = (sequence_loss_packed if upsample_mode == "packed"
                 else sequence_loss)

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            if not freeze_bn:
                mutable = ["batch_stats"]
        if attn_diag:
            mutable = mutable + ["diagnostics"]
        if mutable:
            (lowres, flows), updates = model.apply(
                variables, batch["image1"], batch["image2"], iters=iters,
                upsample_mode=upsample_mode, rngs={"dropout": rng},
                mutable=mutable)
            new_stats = updates.get("batch_stats", batch_stats)
            diag = updates.get("diagnostics", {})
        else:
            lowres, flows = model.apply(
                variables, batch["image1"], batch["image2"], iters=iters,
                upsample_mode=upsample_mode, rngs={"dropout": rng})
            new_stats = batch_stats
            diag = {}
        loss, metrics = loss_impl(flows.astype(jnp.float32),
                                  batch["flow"], batch["valid"], gamma)
        if diag:
            metrics = dict(metrics, **_summarize_attn_diag(diag))
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats,
                          opt_state=new_opt_state), metrics

    return train_step
