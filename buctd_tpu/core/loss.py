"""Heatmap losses (lib/core/loss.py).

All losses take NHWC predictions (B, h, w, J) — the model's native layout — plus
targets in the same layout and per-joint weights (B, J).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def joints_mse_loss(pred, target, target_weight, use_target_weight: bool = True):
    """½·MSE per joint, masked by target_weight, averaged over joints
    (loss.py:17-41).  Equal per-joint element counts make this one masked mean."""
    if use_target_weight:
        w = target_weight[:, None, None, :]
        diff = (pred - target) * w
    else:
        diff = pred - target
    return 0.5 * jnp.mean(diff**2)


def joints_ohkm_mse_loss(pred, target, target_weight, topk: int = 8,
                         use_target_weight: bool = True):
    """Online hard keypoint mining (loss.py:140-182): per sample, average only the
    top-k hardest joints' losses."""
    if use_target_weight:
        w = target_weight[:, None, None, :]
        diff = (pred - target) * w
    else:
        diff = pred - target
    per_joint = 0.5 * jnp.mean(diff**2, axis=(1, 2))  # (B, J)
    topk_vals, _ = jax.lax.top_k(per_joint, topk)
    return jnp.mean(jnp.sum(topk_vals, axis=1) / topk)


def make_loss(cfg):
    """Loss factory matching the reference's LOSS config block."""
    if cfg.LOSS.USE_OHKM:
        topk = int(cfg.LOSS.TOPK)
        use_w = bool(cfg.LOSS.USE_TARGET_WEIGHT)

        def loss_fn(pred, target, target_weight):
            return joints_ohkm_mse_loss(pred, target, target_weight, topk, use_w)
    else:
        use_w = bool(cfg.LOSS.USE_TARGET_WEIGHT)

        def loss_fn(pred, target, target_weight):
            return joints_mse_loss(pred, target, target_weight, use_w)

    return loss_fn
