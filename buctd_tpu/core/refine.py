"""On-device iterative refinement (BASELINE.json north star; README.md:104).

The reference runs 3x refinement as three manual tools/test.py invocations wired
through result-json files (dataloader.py:337-339); tools/test.py reproduces that
protocol.  THIS module is the TPU-native serving form: one jitted lax.scan where
each round re-derives condition boxes from the previous round's predictions,
re-crops the source image with the aligned matmul warp, re-renders the condition,
and re-runs the model — no host round-trips between rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.joints_dataset import IMAGENET_MEAN, IMAGENET_STD
from ..data.pipeline import condition_mode, render_condition
from ..geometry import affine_points_jax, make_affine_jax
from ..ops import get_final_preds
from ..ops.warp import warp_affine_aligned


def joints2cs_jax(joints, img_w, img_h, margin, aspect_ratio, scale_thre=1.25,
                  pixel_std=200.0):
    """Batched condition-keypoints -> (center, scale): nonzero-extent box + margin,
    clipped to the image, aspect-corrected, x1.25 inflated (JointsDataset.py:218-232,
    geometry.xywh2cs)."""
    x, y = joints[..., 0], joints[..., 1]
    valid_x = x != 0
    valid_y = y != 0
    big = jnp.float32(1e9)
    xmin = jnp.min(jnp.where(valid_x, x, big), axis=-1) - margin
    xmax = jnp.max(jnp.where(valid_x, x, -big), axis=-1) + margin
    ymin = jnp.min(jnp.where(valid_y, y, big), axis=-1) - margin
    ymax = jnp.max(jnp.where(valid_y, y, -big), axis=-1) + margin
    xmin = jnp.clip(xmin, 0, img_w)
    xmax = jnp.clip(xmax, 0, img_w)
    ymin = jnp.clip(ymin, 0, img_h)
    ymax = jnp.clip(ymax, 0, img_h)
    # degenerate (no valid kpts) -> full image box
    any_valid = valid_x.any(axis=-1) & valid_y.any(axis=-1)
    xmin = jnp.where(any_valid, xmin, 0.0)
    ymin = jnp.where(any_valid, ymin, 0.0)
    xmax = jnp.where(any_valid, xmax, img_w)
    ymax = jnp.where(any_valid, ymax, img_h)

    w, h = xmax - xmin, ymax - ymin
    center = jnp.stack([xmin + w * 0.5, ymin + h * 0.5], -1)
    h_adj = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w_adj = jnp.where(w < aspect_ratio * h, h * aspect_ratio, w)
    scale = jnp.stack([w_adj / pixel_std, h_adj / pixel_std], -1) * scale_thre
    return center, scale


def make_refine_fn(cfg, model, kpt_colors, n_iters: int = 3):
    """Jitted (variables, image (H, W, 3) RGB uint8/float, cond (P, J, 3)) ->
    (preds (P, J, 2) image coords, maxvals (P, J, 1)) after ``n_iters`` rounds.

    Every round is crop -> render -> forward -> decode entirely on device
    (lax.scan over rounds).
    """
    img_w, img_h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
    hm_w, hm_h = int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1])
    margin = float(cfg.DATASET.BU_BBOX_MARGIN)
    aspect = img_w / img_h
    scale_thre = float(cfg.TEST.SCALE_THRE)
    mode = condition_mode(cfg)
    post = bool(cfg.TEST.POST_PROCESS)
    use_dark = bool(cfg.TEST.USE_DARK)
    colors = np.asarray(kpt_colors, np.float32)
    # warp/render matmul precision follows the model dtype: a bf16 model
    # quantizes its input anyway, so exact-f32 warps are discarded (0.00 px
    # decode drift, +3.4% e2e — tools/bench_precision.py); an f32 eval model
    # keeps the exact path
    prec = "default" if "bfloat16" in str(cfg.TPU.EVAL_DTYPE) else "highest"

    @functools.partial(jax.jit, static_argnames=())
    def refine(variables, image, cond_joints, img_wh=None):
        """img_wh: optional (2,) [width, height] of the REAL image when ``image``
        is padded to a bucket — condition boxes clip to these bounds, not the pad."""
        image = image.astype(jnp.float32)
        H, W = image.shape[0], image.shape[1]
        if img_wh is None:
            bw, bh = jnp.float32(W), jnp.float32(H)
        else:
            bw, bh = img_wh[0], img_wh[1]
        P = cond_joints.shape[0]
        imgs = jnp.broadcast_to(image[None], (P, H, W, 3))

        def one_round(cond, _):
            center, scale = joints2cs_jax(cond, bw, bh, margin, aspect, scale_thre)
            zeros = jnp.zeros(P)
            t_inv = make_affine_jax(center, scale, zeros, (img_w, img_h), inv=True)
            crops = warp_affine_aligned(imgs, t_inv, (img_h, img_w),
                                        precision=prec)
            t_fwd = make_affine_jax(center, scale, zeros, (img_w, img_h))
            cond_crop = cond.at[..., :2].set(
                affine_points_jax(cond[..., :2], t_fwd))
            rgb = (crops / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            cond_img = render_condition(cond_crop, mode, (img_h, img_w), colors,
                                        precision=prec)
            x = jnp.concatenate([rgb, cond_img], axis=-1)
            hm = model.apply(variables, x, train=False).transpose(0, 3, 1, 2)
            preds, maxvals = get_final_preds(hm, center, scale, (hm_w, hm_h),
                                             post_process=post, use_dark=use_dark)
            new_cond = jnp.concatenate([preds, maxvals], axis=-1)
            return new_cond, (preds, maxvals)

        final_cond, (all_preds, all_maxvals) = jax.lax.scan(
            one_round, cond_joints.astype(jnp.float32), None, length=n_iters)
        return all_preds[-1], all_maxvals[-1]

    return refine
