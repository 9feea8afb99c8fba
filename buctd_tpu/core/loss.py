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


def joints_lambda_mse_loss(pred, target, target_weight, use_target_weight=True):
    """Per-SAMPLE masked ½MSE (loss.py:43-68) — the λ-conditioned (MIPNet-heritage)
    variant: same math as joints_mse_loss but reduced per sample, returning (B,)."""
    if use_target_weight:
        w = target_weight[:, None, None, :]
        diff = (pred - target) * w
    else:
        diff = pred - target
    return 0.5 * jnp.mean(diff**2, axis=(1, 2, 3))


def joints_expectation_loss(pred, target_joints, target_weight):
    """Soft-argmax L1 experiment (loss.py:71-138): L1 between the heatmap's
    expected LINEAR index (sum(p*locs)/25.0813 — the reference's fixed normalizer)
    and the GT joint's linear index width*y + x.

    pred: (B, h, w, J); target_joints: (B, J, 2) heatmap-frame (x, y).
    """
    B, h, w, J = pred.shape
    locs = jnp.arange(h * w, dtype=jnp.float32)
    flat = jnp.clip(pred.transpose(0, 3, 1, 2).reshape(B, J, h * w), 1e-10, None)
    expected = (flat * locs).sum(axis=2) / 25.0813          # (B, J)
    linear_gt = w * target_joints[..., 1] + target_joints[..., 0]
    tw = target_weight if target_weight.ndim == 2 else target_weight[..., 0]
    return jnp.mean(jnp.abs(expected * tw - linear_gt * tw))


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
