"""Sequence loss and flow metrics (reference train.py:44-73).

Exponentially weighted (gamma^(N-1-i)) L1 over all refinement-iteration
predictions, masked by validity and a 400 px magnitude cutoff.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

MAX_FLOW = 400.0


def sequence_loss(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray,
                  valid: jnp.ndarray, gamma: float = 0.8
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Args:
      flow_preds: [iters, B, H, W, 2] upsampled predictions.
      flow_gt: [B, H, W, 2]; valid: [B, H, W] (1 = supervised pixel).
    Returns (scalar loss, metrics dict with epe/1px/3px/5px).
    """
    n = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    valid = (valid >= 0.5) & (mag < MAX_FLOW)
    vmask = valid[None, ..., None].astype(flow_preds.dtype)

    weights = gamma ** (n - 1 - jnp.arange(n, dtype=flow_preds.dtype))
    i_loss = jnp.abs(flow_preds - flow_gt[None])
    # Reference takes .mean() over ALL elements (including invalid zeros).
    per_iter = jnp.mean(vmask * i_loss, axis=(1, 2, 3, 4))
    loss = jnp.sum(weights * per_iter)

    epe_map = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    vm = valid.astype(jnp.float32)
    denom = jnp.maximum(vm.sum(), 1.0)
    epe = (epe_map * vm).sum() / denom
    metrics = {
        "epe": epe,
        "1px": ((epe_map < 1) * vm).sum() / denom,
        "3px": ((epe_map < 3) * vm).sum() / denom,
        "5px": ((epe_map < 5) * vm).sum() / denom,
    }
    return loss, metrics


def sequence_loss_packed(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray,
                         valid: jnp.ndarray, gamma: float = 0.8,
                         factor: int = 8
                         ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """sequence_loss for packed-layout predictions (upsample_mode='packed':
    convex_upsample_packed, x|y sub-pixel blocks in the channel dim).  The
    full-res ground truth and mask are packed ONCE per step here, instead of
    pixel-shuffling every iteration's prediction inside the scan (those 6-D
    transposes with a minor dim of 2 cost several tile-padded relayout
    copies per iteration on TPU).  Same math as sequence_loss element for
    element; only the pixel order inside the reductions differs.

    Args:
      flow_preds: [iters, B, H/f, W/f, 2*f^2] packed predictions.
      flow_gt: [B, H, W, 2]; valid: [B, H, W].
    """
    from craft_tpu.ops.geometry import pack_fullres

    n, _, _, _, c2 = flow_preds.shape
    f2 = c2 // 2
    gtp = pack_fullres(flow_gt, factor)            # [B, h, w, 2*f2]
    vp = pack_fullres(valid[..., None], factor)[..., 0:f2]  # [B, h, w, f2]

    mag = jnp.sqrt(gtp[..., :f2] ** 2 + gtp[..., f2:] ** 2)
    validp = (vp >= 0.5) & (mag < MAX_FLOW)
    vmask = jnp.concatenate([validp, validp],
                            axis=-1)[None].astype(flow_preds.dtype)

    weights = gamma ** (n - 1 - jnp.arange(n, dtype=flow_preds.dtype))
    i_loss = jnp.abs(flow_preds - gtp[None])
    per_iter = jnp.mean(vmask * i_loss, axis=(1, 2, 3, 4))
    loss = jnp.sum(weights * per_iter)

    dx = flow_preds[-1, ..., :f2] - gtp[..., :f2]
    dy = flow_preds[-1, ..., f2:] - gtp[..., f2:]
    epe_map = jnp.sqrt(dx ** 2 + dy ** 2)
    vm = validp.astype(jnp.float32)
    denom = jnp.maximum(vm.sum(), 1.0)
    metrics = {
        "epe": (epe_map * vm).sum() / denom,
        "1px": ((epe_map < 1) * vm).sum() / denom,
        "3px": ((epe_map < 3) * vm).sum() / denom,
        "5px": ((epe_map < 5) * vm).sum() / denom,
    }
    return loss, metrics
