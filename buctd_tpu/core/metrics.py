"""Heatmap-space PCK@0.5 training metric (lib/core/evaluate.py:15-70), vectorized.

Matches the reference semantics: decode argmax coords from predicted and target
heatmaps, normalize distances by heatmap_size/10, count joints with dist < 0.5 among
those whose GT coords are > 1 (both axes).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.decode import get_max_preds


def pck_accuracy(pred_heatmaps, target_heatmaps, thr: float = 0.5):
    """Inputs (B, J, h, w).  Returns (avg_acc, cnt, pred_coords).

    cnt is the number of joint TYPES with any valid sample (<= J) — that is what
    the reference feeds the AverageMeter (evaluate.py:60-70), NOT the number of
    valid instance-joints.
    """
    B, J, h, w = pred_heatmaps.shape
    pred, _ = get_max_preds(pred_heatmaps)
    gt, _ = get_max_preds(target_heatmaps)
    # NB reference quirk reproduced on purpose: norm = [h, w]/10 is applied to
    # (x, y) coords (evaluate.py:50-53), i.e. x is divided by h/10 and y by w/10 —
    # the axes are swapped relative to the 'natural' [w, h] normalization
    norm = jnp.array([h, w], jnp.float32) / 10.0

    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)  # (B, J)
    d = jnp.linalg.norm((pred - gt) / norm, axis=-1)
    hit = (d < thr) & valid

    per_joint_cnt = jnp.sum(valid, axis=0)             # (J,)
    per_joint_acc = jnp.where(per_joint_cnt > 0,
                              jnp.sum(hit, axis=0) / jnp.maximum(per_joint_cnt, 1), -1.0)
    n_valid_joints = jnp.sum(per_joint_cnt > 0)
    avg_acc = jnp.where(n_valid_joints > 0,
                        jnp.sum(jnp.where(per_joint_cnt > 0, per_joint_acc, 0.0))
                        / jnp.maximum(n_valid_joints, 1), 0.0)
    return avg_acc, n_valid_joints, pred
