"""Optimizer + LR schedule (reference train.py:76-85).

AdamW(lr, wdecay, eps) with torch-parity OneCycleLR (linear anneal,
pct_start=0.05, total_steps=num_steps+100, div_factor=25,
final_div_factor=1e4) and global-norm gradient clipping at `clip`.
"""

from __future__ import annotations

import optax


def onecycle_linear(max_lr: float, total_steps: int, pct_start: float = 0.05,
                    div_factor: float = 25.0, final_div_factor: float = 1e4):
    """Exact torch OneCycleLR(anneal_strategy='linear') shape."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    # torch: warmup reaches max_lr at step float(pct_start*total)-1, anneal
    # reaches final at step total-1.
    warm = max(int(round(pct_start * total_steps)) - 1, 1)
    return optax.join_schedules(
        [optax.linear_schedule(initial, max_lr, warm),
         optax.linear_schedule(max_lr, final, total_steps - 1 - warm)],
        boundaries=[warm],
    )


def onecycle_linear_host(max_lr: float, total_steps: int,
                         pct_start: float = 0.05, div_factor: float = 25.0,
                         final_div_factor: float = 1e4):
    """Pure-Python twin of onecycle_linear for host-side logging — calling the
    optax schedule from the training loop would dispatch a device computation
    and block every step."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    warm = max(int(round(pct_start * total_steps)) - 1, 1)

    def lr(step: int) -> float:
        if step <= warm:
            return initial + (max_lr - initial) * min(step / warm, 1.0)
        t = min((step - warm) / (total_steps - 1 - warm), 1.0)
        return max_lr + (final - max_lr) * t

    return lr


def make_optimizer(lr: float, num_steps: int, wdecay: float = 5e-5,
                   epsilon: float = 1e-8, clip: float = 1.0,
                   pct_start: float = 0.05):
    schedule = onecycle_linear(lr, num_steps + 100, pct_start)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon,
                    weight_decay=wdecay),
    )
    return tx, schedule
