"""Debug image dumps (reference: lib/utils/vis.py:380-473).

All functions take NHWC float batches (our native layout).  ``save_debug_images`` is
gated by the DEBUG.* config flags exactly like the reference and writes:
  * {prefix}_gt.jpg / {prefix}_pred.jpg — batch grid with joints drawn
  * {prefix}_hm_gt.jpg / {prefix}_hm_pred.jpg — per-joint heatmap grids
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..data.joints_dataset import IMAGENET_MEAN, IMAGENET_STD


def _denormalize(images):
    """Invert ToTensor+Normalize back to uint8 RGB for the first 3 channels."""
    rgb = np.asarray(images)[..., :3]
    rgb = (rgb * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(rgb, 0, 255).astype(np.uint8)


def save_batch_image_with_joints(batch_image, batch_joints, batch_joints_vis,
                                 file_name, nrow=8, padding=2):
    """Grid of crops with joint markers (vis.py:380-409 semantics, NHWC input)."""
    import cv2

    imgs = _denormalize(batch_image)
    B, H, W, _ = imgs.shape
    xmaps = min(nrow, B)
    ymaps = int(math.ceil(B / xmaps))
    grid = np.zeros((ymaps * (H + padding), xmaps * (W + padding), 3), np.uint8)
    k = 0
    for y in range(ymaps):
        for x in range(xmaps):
            if k >= B:
                break
            im = imgs[k].copy()
            for joint, vis in zip(np.asarray(batch_joints[k]),
                                  np.asarray(batch_joints_vis[k])):
                if np.asarray(vis).ravel()[0] > 0:
                    cv2.circle(im, (int(joint[0]), int(joint[1])), 2,
                               (255, 0, 0), 2)
            grid[y * (H + padding):y * (H + padding) + H,
                 x * (W + padding):x * (W + padding) + W] = im
            k += 1
    cv2.imwrite(file_name, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def save_batch_heatmaps(batch_image, batch_heatmaps, file_name, normalize=True):
    """One row per sample: resized crop + each joint heatmap colorized
    (vis.py:409-417 semantics; heatmaps NHWC (B, h, w, J))."""
    import cv2

    imgs = _denormalize(batch_image)
    hms = np.asarray(batch_heatmaps)
    B, h, w, J = hms.shape
    if normalize:
        mn = hms.min(axis=(1, 2), keepdims=True)
        mx = hms.max(axis=(1, 2), keepdims=True)
        hms = (hms - mn) / (mx - mn + 1e-10)

    grid = np.zeros((B * h, (J + 1) * w, 3), np.uint8)
    for i in range(B):
        img = cv2.resize(imgs[i], (w, h))
        grid[i * h:(i + 1) * h, 0:w] = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        for j in range(J):
            cm = cv2.applyColorMap((hms[i, :, :, j] * 255).astype(np.uint8),
                                   cv2.COLORMAP_JET)
            blend = (cm * 0.7 + cv2.cvtColor(img, cv2.COLOR_RGB2BGR) * 0.3)
            grid[i * h:(i + 1) * h, (j + 1) * w:(j + 2) * w] = blend
    cv2.imwrite(file_name, grid)


def save_debug_images(config, input, meta, target, joints_pred, output,
                      prefix):
    """Gated by DEBUG.* flags (vis.py:417-473).  All tensors NHWC numpy/jax."""
    if not config.DEBUG.DEBUG:
        return
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    if config.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(input, meta["joints"], meta["joints_vis"],
                                     f"{prefix}_gt.jpg")
    if config.DEBUG.SAVE_BATCH_IMAGES_PRED:
        vis = np.ones_like(np.asarray(meta["joints_vis"]))
        save_batch_image_with_joints(input, joints_pred, vis,
                                     f"{prefix}_pred.jpg")
    if config.DEBUG.SAVE_HEATMAPS_GT:
        save_batch_heatmaps(input, target, f"{prefix}_hm_gt.jpg")
    if config.DEBUG.SAVE_HEATMAPS_PRED:
        save_batch_heatmaps(input, output, f"{prefix}_hm_pred.jpg")
