"""Affine geometry for crop/warp/decode.

The reference builds its crop transform with a 3-point ``cv2.getAffineTransform`` solve
(lib/utils/transforms.py:86-118).  That construction is a similarity transform, so here it
is written in closed form — a rotation/scale matrix plus translation — which is exact,
batchable, and jit-friendly (no linear solve).  Conventions preserved from the reference:

  * ``scale`` is in units of ``pixel_std = 200`` px (JointsDataset.py:35),
  * only ``scale[0]`` sets the isotropic zoom (transforms.py:94-101),
  * output center maps to ``(dst_w/2, dst_h/2)``,
  * rotation is CCW degrees about the box center.

Both a numpy host path (bit-exact vs the reference for DB building) and batched JAX
versions (for on-device preprocessing/decode) are provided.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PIXEL_STD = 200.0


# ---------------------------------------------------------------------------
# numpy host path
# ---------------------------------------------------------------------------

def make_affine(
    center,
    scale,
    rot: float,
    output_size,
    shift=(0.0, 0.0),
    inv: bool = False,
) -> np.ndarray:
    """2x3 affine mapping source image coords -> crop coords (or inverse).

    Matches lib/utils/transforms.py:86-118 (get_affine_transform) in closed form.
    """
    center = np.asarray(center, dtype=np.float64)
    scale = np.asarray(scale, dtype=np.float64)
    if scale.ndim == 0:
        scale = np.array([float(scale), float(scale)])
    shift = np.asarray(shift, dtype=np.float64)

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    cs, sn = np.cos(rot_rad), np.sin(rot_rad)

    src0 = center + scale_tmp * shift
    dst0 = np.array([dst_w * 0.5, dst_h * 0.5])

    if not inv:
        s = dst_w / src_w
        # A = s * R(-rot)
        A = s * np.array([[cs, sn], [-sn, cs]])
        t = dst0 - A @ src0
    else:
        s = src_w / dst_w
        A = s * np.array([[cs, -sn], [sn, cs]])
        t = src0 - A @ dst0

    return np.concatenate([A, t[:, None]], axis=1).astype(np.float64)


def affine_transform(pt, trans) -> np.ndarray:
    """Apply a 2x3 affine to one (x, y) point (transforms.py:121-124)."""
    pt = np.asarray(pt, dtype=np.float64)
    return trans[:, :2] @ pt[:2] + trans[:, 2]


def affine_transform_points(pts, trans) -> np.ndarray:
    """Apply a 2x3 affine to an (N, 2) array of points."""
    pts = np.asarray(pts, dtype=np.float64)
    return pts @ trans[:, :2].T + trans[:, 2]


def transform_preds(coords, center, scale, output_size) -> np.ndarray:
    """Map crop-frame predictions back to source-image coords (transforms.py:78-83)."""
    trans = make_affine(center, scale, 0, output_size, inv=True)
    out = np.array(coords, dtype=np.float64)
    out[:, :2] = affine_transform_points(coords[:, :2], trans)
    return out


def fliplr_joints(joints, joints_vis, width, matched_parts):
    """Horizontally flip joint coords + swap left/right pairs (transforms.py:61-75).

    Note: like the reference, returns ``joints * joints_vis`` (invisible joints zeroed).
    """
    joints = np.array(joints, dtype=np.float64)
    joints_vis = np.array(joints_vis)
    joints[:, 0] = width - joints[:, 0] - 1
    for a, b in matched_parts:
        joints[[a, b]] = joints[[b, a]]
        joints_vis[[a, b]] = joints_vis[[b, a]]
    return joints * joints_vis, joints_vis


def xywh2cs(x, y, w, h, aspect_ratio, scale_thre=1.25, pixel_std=PIXEL_STD):
    """Box -> (center, scale) with aspect-ratio fix and inflation.

    Matches JointsDataset._xywh2cs (JointsDataset.py:546-562).
    """
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)
    if w > aspect_ratio * h:
        h = w * 1.0 / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / pixel_std, h / pixel_std], dtype=np.float32)
    if center[0] != -1:
        scale = scale * scale_thre
    return center, scale


def joints2box(joints, margin=25, img_w=None, img_h=None):
    """Bounding box of nonzero condition keypoints ± margin (tools/inference.py:208,
    JointsDataset.py:218-228)."""
    joints = np.asarray(joints)
    xs = joints[:, 0][np.nonzero(joints[:, 0])]
    ys = joints[:, 1][np.nonzero(joints[:, 1])]
    if xs.size == 0 or ys.size == 0:
        return None
    xmin, xmax = xs.min() - margin, xs.max() + margin
    ymin, ymax = ys.min() - margin, ys.max() + margin
    if img_w is not None:
        xmin, xmax = np.clip(xmin, 0, img_w), np.clip(xmax, 0, img_w)
    if img_h is not None:
        ymin, ymax = np.clip(ymin, 0, img_h), np.clip(ymax, 0, img_h)
    return np.array([xmin, ymin, xmax - xmin, ymax - ymin], dtype=np.float32)


# ---------------------------------------------------------------------------
# JAX batched path
# ---------------------------------------------------------------------------

def make_affine_jax(center, scale, rot, output_size, inv: bool = False) -> jnp.ndarray:
    """Batched closed-form affine: (B,2) center, (B,2) scale, (B,) rot deg -> (B,2,3)."""
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)

    src_w = scale[..., 0] * PIXEL_STD
    dst_w = jnp.float32(output_size[0])
    dst_h = jnp.float32(output_size[1])

    rot_rad = jnp.pi * rot / 180.0
    cs, sn = jnp.cos(rot_rad), jnp.sin(rot_rad)
    dst0 = jnp.stack([jnp.broadcast_to(dst_w * 0.5, cs.shape),
                      jnp.broadcast_to(dst_h * 0.5, cs.shape)], axis=-1)

    # NOTE: written elementwise (not einsum) — on TPU, einsum defaults to bf16
    # matmul precision, which costs ~1e-3 relative accuracy on decode coordinates.
    if not inv:
        s = dst_w / src_w
        A = s[..., None, None] * jnp.stack(
            [jnp.stack([cs, sn], -1), jnp.stack([-sn, cs], -1)], axis=-2)
        tx = dst0[..., 0] - (A[..., 0, 0] * center[..., 0] + A[..., 0, 1] * center[..., 1])
        ty = dst0[..., 1] - (A[..., 1, 0] * center[..., 0] + A[..., 1, 1] * center[..., 1])
    else:
        s = src_w / dst_w
        A = s[..., None, None] * jnp.stack(
            [jnp.stack([cs, -sn], -1), jnp.stack([sn, cs], -1)], axis=-2)
        tx = center[..., 0] - (A[..., 0, 0] * dst0[..., 0] + A[..., 0, 1] * dst0[..., 1])
        ty = center[..., 1] - (A[..., 1, 0] * dst0[..., 0] + A[..., 1, 1] * dst0[..., 1])

    t = jnp.stack([tx, ty], axis=-1)
    return jnp.concatenate([A, t[..., None]], axis=-1)


def affine_points_jax(pts, trans) -> jnp.ndarray:
    """Apply (...,2,3) affines to (...,N,2) points (elementwise; see precision note)."""
    A = trans[..., None, :, :2]  # (..., 1, 2, 2)
    x = A[..., 0, 0] * pts[..., 0] + A[..., 0, 1] * pts[..., 1] + trans[..., None, 0, 2]
    y = A[..., 1, 0] * pts[..., 0] + A[..., 1, 1] * pts[..., 1] + trans[..., None, 1, 2]
    return jnp.stack([x, y], axis=-1)


def transform_preds_jax(coords, center, scale, output_size) -> jnp.ndarray:
    """Batched inverse-affine unprojection of (B,J,2) crop coords."""
    trans = make_affine_jax(center, scale, jnp.zeros(center.shape[:-1]), output_size, inv=True)
    return affine_points_jax(coords, trans)


def fliplr_joints_jax(joints, joints_vis, width, flip_pairs_perm) -> tuple:
    """Batched joint flip. ``flip_pairs_perm`` is a precomputed (J,) permutation."""
    joints = joints.at[..., 0].set(width - joints[..., 0] - 1)
    joints = joints[..., flip_pairs_perm, :]
    joints_vis = joints_vis[..., flip_pairs_perm, :]
    return joints * joints_vis, joints_vis


def flip_pairs_to_perm(num_joints: int, flip_pairs) -> np.ndarray:
    """Left/right pair list -> permutation vector, for gather-based flipping."""
    perm = np.arange(num_joints)
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return perm
