"""Heatmap decoding, fully vectorized on device.

Replaces the reference's per-pixel python loops (lib/core/inference.py:19-152):
  * ``get_max_preds`` — argmax -> (x, y), zeroed where max <= 0,
  * POST_PROCESS ±0.25 px gradient-sign nudge (inference.py:64-77),
  * DARK decode (inference.py:90-152): k=11 blur on a zero-padded border with
    per-map max re-scaling, log, and a 2x2 Newton/Taylor step,
  * inverse-affine unprojection back to source-image coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry import transform_preds_jax
from .heatmap import opencv_gaussian_kernel, _sep_blur


def get_max_preds(heatmaps: jnp.ndarray):
    """(B, J, h, w) -> preds (B, J, 2) float32 crop-frame coords, maxvals (B, J, 1).

    Matches lib/core/inference.py:19-47 (first-max argmax tie-breaking included).
    """
    B, J, h, w = heatmaps.shape
    flat = heatmaps.reshape(B, J, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals[..., None]


def _gather_hm(heatmaps, py, px):
    """heatmaps (B, J, h, w); py/px (B, J) int -> values (B, J), indices clipped."""
    B, J, h, w = heatmaps.shape
    py = jnp.clip(py, 0, h - 1)
    px = jnp.clip(px, 0, w - 1)
    flat = heatmaps.reshape(B, J, h * w)
    return jnp.take_along_axis(flat, (py * w + px)[..., None], axis=2)[..., 0]


def post_process_nudge(heatmaps, coords):
    """±0.25 px shift along the local gradient sign (inference.py:64-77)."""
    B, J, h, w = heatmaps.shape
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    inb = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    dx = _gather_hm(heatmaps, py, px + 1) - _gather_hm(heatmaps, py, px - 1)
    dy = _gather_hm(heatmaps, py + 1, px) - _gather_hm(heatmaps, py - 1, px)
    delta = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + delta * inb[..., None].astype(jnp.float32)


def dark_blur(heatmaps: jnp.ndarray, kernel: int = 11) -> jnp.ndarray:
    """The DARK modulation blur (inference.py:113-127).

    Zero-pads a (kernel-1)/2 border, Gaussian-blurs (cv2 ksize=kernel, sigma from
    OpenCV's rule), crops back, and rescales each map to its original max.
    """
    B, J, h, w = heatmaps.shape
    border = (kernel - 1) // 2
    x = heatmaps.reshape(B * J, h, w, 1)
    orig_max = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    xp = jnp.pad(x, ((0, 0), (border, border), (border, border), (0, 0)))
    blurred = _sep_blur(xp, opencv_gaussian_kernel(kernel), "reflect")
    blurred = blurred[:, border:-border, border:-border, :]
    new_max = jnp.max(blurred, axis=(1, 2, 3), keepdims=True)
    scaled = blurred * jnp.where(new_max == 0, 0.0, orig_max / jnp.where(new_max == 0, 1.0, new_max))
    return scaled.reshape(B, J, h, w)


def dark_refine(heatmaps, coords, kernel: int = 11):
    """DARK Taylor refinement (inference.py:90-109,131-142), batched.

    heatmaps are the RAW maps; blurring/log happens here.
    """
    B, J, h, w = heatmaps.shape
    hm = jnp.log(jnp.maximum(dark_blur(heatmaps, kernel), 1e-10))
    px = coords[..., 0].astype(jnp.int32)
    py = coords[..., 1].astype(jnp.int32)
    inb = (px > 1) & (px < w - 2) & (py > 1) & (py < h - 2)

    g = lambda dy, dx: _gather_hm(hm, py + dy, px + dx)
    dx = 0.5 * (g(0, 1) - g(0, -1))
    dy = 0.5 * (g(1, 0) - g(-1, 0))
    dxx = 0.25 * (g(0, 2) - 2.0 * g(0, 0) + g(0, -2))
    dxy = 0.25 * (g(1, 1) - g(-1, 1) - g(1, -1) + g(-1, -1))
    dyy = 0.25 * (g(2, 0) - 2.0 * g(0, 0) + g(-2, 0))

    det = dxx * dyy - dxy * dxy
    ok = inb & (det != 0.0)
    safe_det = jnp.where(ok, det, 1.0)
    # offset = -H^-1 @ grad, H = [[dxx, dxy], [dxy, dyy]]
    off_x = -(dyy * dx - dxy * dy) / safe_det
    off_y = -(-dxy * dx + dxx * dy) / safe_det
    offset = jnp.stack([off_x, off_y], axis=-1) * ok[..., None].astype(jnp.float32)
    return coords + offset


@functools.partial(jax.jit, static_argnames=("heatmap_size", "post_process", "use_dark"))
def get_final_preds(heatmaps, center, scale, heatmap_size, post_process=True, use_dark=False):
    """Full decode: argmax [-> nudge | DARK] -> inverse affine to image coords.

    Matches lib/core/inference.py:51-87 / :131-152.

    Returns preds (B, J, 2) in source-image coords and maxvals (B, J, 1).
    """
    coords, maxvals = get_max_preds(heatmaps)
    if use_dark:
        coords = dark_refine(heatmaps, coords)
    elif post_process:
        coords = post_process_nudge(heatmaps, coords)
    preds = transform_preds_jax(coords, center, scale, heatmap_size)
    return preds, maxvals
