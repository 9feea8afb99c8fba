"""Heatmap synthesis: training targets and condition renderings.

Batched, jit-compiled replacements for the reference's per-sample numpy/cv2 loops:

  * ``generate_target`` — windowed unnormalized Gaussian stamps
    (JointsDataset.py:397-453), written closed-form over a broadcast grid.  The
    reference's integer-rounded centers (``int(x/stride + 0.5)``, truncation semantics)
    and its off-screen weight-zeroing are reproduced exactly.
  * ``render_condition_*`` — the three condition encodings (colored / stacked / plain,
    JointsDataset.py:471-543): point-splat at ``(y-1, x-1)`` with strict bounds, then a
    15x15 Gaussian blur, then peak-normalize to 255.  NB the reference passes the tuple
    ``(15, 15)`` as cv2.GaussianBlur's *ksize* (not sigma), so the true blur is a 15-tap
    kernel with sigma = 0.3*((15-1)*0.5 - 1) + 0.8 = 2.6 per OpenCV's rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def opencv_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D Gaussian kernel matching cv2.getGaussianKernel (for ksize > 7 or sigma > 0)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _sep_blur(x: jnp.ndarray, kernel: np.ndarray, pad_mode: str) -> jnp.ndarray:
    """Separable 2-D blur over the leading two axes of (..., H, W, C).

    Static tap count -> XLA fuses this into a handful of VPU FMAs; 'reflect' matches
    cv2's default BORDER_REFLECT_101.
    """
    k = len(kernel)
    r = k // 2
    h, w = x.shape[-3], x.shape[-2]
    pad_h = [(0, 0)] * (x.ndim - 3) + [(r, r), (0, 0), (0, 0)]
    xp = jnp.pad(x, pad_h, mode=pad_mode)
    x = sum(float(kernel[i]) * jax.lax.slice_in_dim(xp, i, i + h, axis=-3) for i in range(k))
    pad_w = [(0, 0)] * (x.ndim - 3) + [(0, 0), (r, r), (0, 0)]
    xp = jnp.pad(x, pad_w, mode=pad_mode)
    return sum(float(kernel[i]) * jax.lax.slice_in_dim(xp, i, i + w, axis=-2) for i in range(k))


def gaussian_blur2d(x: jnp.ndarray, ksize: int = 15, sigma: float = 0.0) -> jnp.ndarray:
    """cv2.GaussianBlur(x, (ksize, ksize), sigma) on (..., H, W, C) arrays."""
    return _sep_blur(x, opencv_gaussian_kernel(ksize, sigma), "reflect")


# ---------------------------------------------------------------------------
# training target
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("image_size", "heatmap_size", "sigma"))
def generate_target(joints, joints_vis, image_size, heatmap_size, sigma):
    """Batched Gaussian target heatmaps.

    Args:
      joints: (B, J, 2+) crop-frame joint coords (x, y, ...).
      joints_vis: (B, J) or (B, J, k) visibility (first column used).
      image_size: static (w, h) of the input crop.
      heatmap_size: static (w, h) of the heatmap.
      sigma: static Gaussian sigma (heatmap px).

    Returns:
      target (B, J, h, w) float32, weight (B, J) float32.
    """
    if joints_vis.ndim == 3:
        joints_vis = joints_vis[..., 0]
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = image_size[0] / heatmap_size[0]
    stride_y = image_size[1] / heatmap_size[1]
    tmp = int(sigma * 3)

    # int() truncation semantics, matching JointsDataset.py:419-420
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    ul_x, ul_y = mu_x - tmp, mu_y - tmp
    br_x, br_y = mu_x + tmp + 1, mu_y + tmp + 1
    oob = (ul_x >= w) | (ul_y >= h) | (br_x < 0) | (br_y < 0)

    weight = joints_vis.astype(jnp.float32) * (1.0 - oob.astype(jnp.float32))

    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    mx = mu_x[..., None, None]
    my = mu_y[..., None, None]
    g = jnp.exp(-((xs - mx) ** 2 + (ys - my) ** 2) / (2.0 * sigma**2))
    window = (xs >= ul_x[..., None, None]) & (xs < br_x[..., None, None]) & \
             (ys >= ul_y[..., None, None]) & (ys < br_y[..., None, None])
    stamp = (weight > 0.5)[..., None, None]
    target = jnp.where(window & stamp, g, 0.0)
    return target.astype(jnp.float32), weight


# ---------------------------------------------------------------------------
# condition renderings
# ---------------------------------------------------------------------------
#
# The reference renders each condition by scatter-splatting points then blurring
# (JointsDataset.py:457-543).  Scatter is slow on TPU, but blur(splat) is linear, so we
# compute the blurred image in closed form: for each joint, the blurred one-hot factors
# into an outer product of two 1-D blurred-delta profiles, i.e. columns of the
# (reflect-padded) blur matrix.  The whole render becomes one einsum on the MXU.

@functools.lru_cache(maxsize=8)
def _blur_matrix(size: int, ksize: int) -> np.ndarray:
    """(size, size) matrix M with M @ v == separable blur of v (reflect-101 pad)."""
    kernel = opencv_gaussian_kernel(ksize)
    r = ksize // 2
    idx = np.arange(-r, size + r)
    idx = np.abs(idx)                          # reflect-101 lower edge
    idx = np.where(idx >= size, 2 * size - 2 - idx, idx)  # upper edge
    m = np.zeros((size, size), np.float32)
    for t in range(ksize):
        m[np.arange(size), idx[t:t + size]] += kernel[t]
    return m


def _delta_profiles(points, out_hw, ksize, overwrite: bool):
    """Blurred per-joint axis profiles for a splat at (y-1, x-1).

    points: (B, J, 2).  Returns ky (B, J, H), kx (B, J, W), keep (B, J) — keep applies
    the strict bounds test (0 < x < W, 0 < y < H, JointsDataset.py:476-479) and, when
    ``overwrite`` (single-canvas renders), drops joints overwritten by a LATER joint
    landing on the same pixel (the reference's python loop write order).
    """
    H, W = out_hw
    pts = jnp.trunc(points.astype(jnp.float32)).astype(jnp.int32)
    x, y = pts[..., 0], pts[..., 1]
    valid = (x > 0) & (x < W) & (y > 0) & (y < H)
    xc = jnp.clip(x - 1, 0, W - 1)
    yc = jnp.clip(y - 1, 0, H - 1)

    keep = valid
    if overwrite:
        same = (xc[:, :, None] == xc[:, None, :]) & (yc[:, :, None] == yc[:, None, :])
        J = points.shape[1]
        later = np.triu(np.ones((J, J), bool), 1)          # j' > j
        clobbered = jnp.any(same & later & valid[:, None, :], axis=2)
        keep = valid & ~clobbered

    by = jnp.asarray(_blur_matrix(H, ksize))
    bx = jnp.asarray(_blur_matrix(W, ksize))
    ky = by.T[yc] * keep[..., None]                         # (B, J, H)
    kx = bx.T[xc] * keep[..., None]                         # (B, J, W)
    return ky, kx, keep


@functools.partial(jax.jit, static_argnames=("out_hw", "precision"))
def render_condition_colored(cond_joints, colors, out_hw, precision="highest"):
    """3-channel rainbow condition image (get_condition_image_colored).

    cond_joints: (B, J, 2+); colors: (J, 3) uint/float; out_hw: static (H, W).
    Returns (B, H, W, 3) float32, peak-normalized to 255 across all channels.

    precision: 'highest' (exact f32, the parity default) or 'default' (bf16 MXU
    passes — serving fast path; see warp_affine_aligned).  The contraction is
    color-weighted first (bjh,jc->bjhc) so the j-reduction is a small batched
    GEMM instead of materializing a (B, J, H, W) intermediate in HBM.
    """
    colors = jnp.asarray(colors, jnp.float32)
    ky, kx, _ = _delta_profiles(cond_joints[..., :2], out_hw, 15, overwrite=True)
    kyc = jnp.einsum("bjh,jc->bjhc", ky, colors, precision=precision)
    canvas = jnp.einsum("bjhc,bjw->bhwc", kyc, kx, precision=precision)
    am = jnp.max(canvas, axis=(1, 2, 3), keepdims=True)
    return jnp.where(am == 0, canvas, canvas * (255.0 / am))


@functools.partial(jax.jit, static_argnames=("out_hw", "precision"))
def render_condition_stacked(cond_joints, out_hw, precision="highest"):
    """J-channel condition: one blurred point per channel (get_stacked_condition).

    Each channel is blurred and peak-normalized independently, as the reference calls
    generate_heatmap per joint.  Returns (B, H, W, J) float32.
    """
    ky, kx, _ = _delta_profiles(cond_joints[..., :2], out_hw, 15, overwrite=False)
    canvas = jnp.einsum("bjh,bjw->bhwj", ky, kx, precision=precision) * 255.0
    am = jnp.max(canvas, axis=(1, 2), keepdims=True)
    return jnp.where(am == 0, canvas, canvas * (255.0 / am))


@functools.partial(jax.jit, static_argnames=("out_hw", "precision"))
def render_condition_plain(cond_joints, out_hw, precision="highest"):
    """1-channel condition replicated x3 (get_condition_image).

    The reference casts the final map to int (JointsDataset.py:514) — reproduced with a
    trunc.  NB 'default' (bf16) precision is unsafe HERE: the trunc-to-int after
    peak-normalization amplifies sub-intensity error to a full level.
    """
    ky, kx, _ = _delta_profiles(cond_joints[..., :2], out_hw, 15, overwrite=True)
    canvas = jnp.einsum("bjh,bjw->bhw", ky, kx, precision=precision) * 255.0
    am = jnp.max(canvas, axis=(1, 2), keepdims=True)
    hm = jnp.trunc(jnp.where(am == 0, canvas, canvas * (255.0 / am)))
    return jnp.repeat(hm[..., None], 3, axis=-1)
