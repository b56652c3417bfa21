"""Checkpoint save/load via orbax (reference train.py:132-175 capabilities).

Persists {params, batch_stats, opt_state, step, logger state}; periodic saves
``{step}_{name}`` plus a final ``{name}`` (train.py:208-209, 247-248); loading
supports model-only restore (fresh optimizer/scheduler — the curriculum
transfer default) or full-state resume (--loadopt/--loadsched), and falls back
to the one-way PyTorch ``.pth`` converter for reference checkpoints.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, logger_state: Optional[Dict] = None):
    """Save a TrainState (+ optional logger dict) to `path` (a directory)."""
    os.makedirs(path, exist_ok=True)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "step": np.asarray(state.step),
        "params": _to_numpy_tree(state.params),
        "batch_stats": _to_numpy_tree(state.batch_stats),
    }
    ckptr.save(osp.join(osp.abspath(path), "model"), payload, force=True)
    # Optimizer state can contain nested dataclasses; pickle is simplest and
    # matches the reference's single-file torch.save approach.
    with open(osp.join(path, "opt_state.pkl"), "wb") as f:
        pickle.dump(_to_numpy_tree(state.opt_state), f)
    if logger_state is not None:
        with open(osp.join(path, "logger.pkl"), "wb") as f:
            pickle.dump(logger_state, f)
    print(f"{path} saved")


def _set_schedule_position(opt_state, step: int):
    """Set every `count` field in an optax state tree to `step`, advancing the
    LR schedule without restoring optimizer moments (the reference's
    --loadsched-without---loadopt semantics: lr_scheduler.load_state_dict with
    a fresh optimizer, train.py:164-172)."""
    if hasattr(opt_state, "_fields"):  # optax NamedTuple states
        return type(opt_state)(**{
            f: (np.asarray(step, getattr(opt_state, f).dtype)
                if f == "count" else
                _set_schedule_position(getattr(opt_state, f), step))
            for f in opt_state._fields})
    if isinstance(opt_state, tuple):
        return tuple(_set_schedule_position(s, step) for s in opt_state)
    if isinstance(opt_state, list):
        return [_set_schedule_position(s, step) for s in opt_state]
    if isinstance(opt_state, dict):
        return {k: _set_schedule_position(v, step)
                for k, v in opt_state.items()}
    return opt_state


def load_checkpoint(path: str, state, load_optimizer_state: bool = False,
                    load_scheduler_state: bool = False,
                    load_logger: bool = False):
    """Restore into an existing TrainState template.  Returns (state, logger).

    load_optimizer_state: restore the full optimizer state (moments + step).
    load_scheduler_state: restore the LR-schedule position (step count) even
        with a fresh optimizer — reference --loadsched (train.py:164-172).
    If `path` ends with .pth, converts a PyTorch reference checkpoint
    (model weights + BN stats only).
    """
    from craft_tpu.training.train_step import TrainState

    logger_state = None
    if path.endswith(".pth"):
        from craft_tpu.utils.torch_convert import convert_checkpoint

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        new_vars, report = convert_checkpoint(path, None, variables,
                                              strict=False)
        if report["missing"]:
            print(f"WARNING: {len(report['missing'])} leaves not found in "
                  f"{path} (kept initialized values)")
        state = TrainState(step=state.step, params=new_vars["params"],
                           batch_stats=new_vars.get("batch_stats",
                                                    state.batch_stats),
                           opt_state=state.opt_state)
        print(f"Model checkpoint converted from {path}")
        return state, None

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "step": np.asarray(state.step),
        "params": _to_numpy_tree(state.params),
        "batch_stats": _to_numpy_tree(state.batch_stats),
    }
    payload = ckptr.restore(osp.join(osp.abspath(path), "model"),
                            item=template)
    opt_state = state.opt_state
    if load_optimizer_state and osp.isfile(osp.join(path, "opt_state.pkl")):
        with open(osp.join(path, "opt_state.pkl"), "rb") as f:
            restored = pickle.load(f)
        opt_state = jax.tree.map(lambda t, r: r, state.opt_state, restored)
        print("Optimizer state loaded.")
    else:
        print("Optimizer state NOT loaded.")
    if load_logger and osp.isfile(osp.join(path, "logger.pkl")):
        with open(osp.join(path, "logger.pkl"), "rb") as f:
            logger_state = pickle.load(f)
        print("Logger loaded.")

    resume_step = load_optimizer_state or load_scheduler_state
    if load_scheduler_state and not load_optimizer_state:
        opt_state = _set_schedule_position(opt_state, int(payload["step"]))
        print("Scheduler state loaded.")
    step = payload["step"] if resume_step else state.step
    state = TrainState(step=step, params=payload["params"],
                       batch_stats=payload["batch_stats"],
                       opt_state=opt_state)
    print(f"Model checkpoint loaded from {path}")
    return state, logger_state
