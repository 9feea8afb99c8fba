"""Geometry parity tests.

Oracle: the reference constructs its affine via a 3-point cv2.getAffineTransform solve
(lib/utils/transforms.py:86-118). We rebuild that oracle here directly with cv2 and check
our closed-form (and batched JAX) versions against it.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from buctd_tpu.geometry import (
    affine_transform,
    affine_transform_points,
    affine_points_jax,
    fliplr_joints,
    fliplr_joints_jax,
    flip_pairs_to_perm,
    make_affine,
    make_affine_jax,
    transform_preds,
    transform_preds_jax,
    xywh2cs,
)


def _oracle_affine(center, scale, rot, output_size, shift=np.zeros(2), inv=0):
    """Reference-style 3-point construction, as a test oracle."""
    scale_tmp = np.asarray(scale) * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180

    def rot_vec(pt, r):
        sn, cs = np.sin(r), np.cos(r)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]])

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale_tmp * shift
    src[1] = src[0] + rot_vec([0, src_w * -0.5], rot_rad)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + np.array([0, dst_w * -0.5])
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


CASES = [
    (np.array([321.5, 240.0]), np.array([1.3, 1.9]), 0.0, (288, 384)),
    (np.array([100.0, 50.0]), np.array([0.8, 0.8]), 30.0, (192, 256)),
    (np.array([55.3, 402.1]), np.array([2.1, 1.1]), -72.5, (288, 384)),
    (np.array([0.0, 0.0]), np.array([0.5, 0.7]), 180.0, (72, 96)),
    (np.array([613.0, 17.0]), np.array([3.3, 2.2]), 13.37, (48, 64)),
]


@pytest.mark.parametrize("center,scale,rot,size", CASES)
def test_make_affine_matches_cv2_oracle(center, scale, rot, size):
    for inv in (0, 1):
        ours = make_affine(center, scale, rot, size, inv=inv)
        oracle = _oracle_affine(center, scale, rot, size, inv=inv)
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_make_affine_inverse_roundtrip():
    c, s, r, size = CASES[2][:4]
    fwd = make_affine(c, s, r, size)
    inv = make_affine(c, s, r, size, inv=True)
    pts = np.random.RandomState(0).rand(10, 2) * 500
    back = affine_transform_points(affine_transform_points(pts, fwd), inv)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_affine_transform_single_point():
    trans = make_affine([100, 100], [1.0, 1.0], 0, (200, 200))
    out = affine_transform([100, 100], trans)
    np.testing.assert_allclose(out, [100, 100], atol=1e-6)


def test_make_affine_jax_matches_numpy():
    centers = np.stack([c for c, _, _, _ in CASES])
    scales = np.stack([s for _, s, _, _ in CASES])
    rots = np.array([r for _, _, r, _ in CASES], np.float32)
    size = (288, 384)
    batched = np.asarray(make_affine_jax(centers, scales, rots, size))
    for i in range(len(CASES)):
        ref = make_affine(centers[i], scales[i], rots[i], size)
        np.testing.assert_allclose(batched[i], ref, rtol=1e-4, atol=1e-3)
    inv_b = np.asarray(make_affine_jax(centers, scales, rots, size, inv=True))
    for i in range(len(CASES)):
        ref = make_affine(centers[i], scales[i], rots[i], size, inv=True)
        np.testing.assert_allclose(inv_b[i], ref, rtol=1e-4, atol=1e-3)


def test_transform_preds_jax_matches_numpy():
    rng = np.random.RandomState(1)
    B, J = 4, 17
    coords = rng.rand(B, J, 2).astype(np.float32) * 70
    centers = rng.rand(B, 2).astype(np.float32) * 400
    scales = (rng.rand(B, 2).astype(np.float32) + 0.5) * 2
    size = (72, 96)
    got = np.asarray(transform_preds_jax(jnp.array(coords), jnp.array(centers),
                                         jnp.array(scales), size))
    for b in range(B):
        want = transform_preds(np.concatenate([coords[b], np.zeros((J, 1))], 1),
                               centers[b], scales[b], size)[:, :2]
        np.testing.assert_allclose(got[b], want, rtol=1e-3, atol=1e-2)


def test_fliplr_joints_matches_spec():
    pairs = [(1, 2), (3, 4)]
    joints = np.arange(10, dtype=np.float64).reshape(5, 2)
    joints = np.concatenate([joints, np.zeros((5, 1))], 1)
    vis = np.ones((5, 3))
    vis[4] = 0
    width = 100
    out, out_vis = fliplr_joints(joints.copy(), vis.copy(), width, pairs)
    # x mirrored, pairs swapped, invisible joints zeroed
    assert out[0, 0] == width - joints[0, 0] - 1
    assert out[1, 1] == joints[2, 1] and out[2, 1] == joints[1, 1]
    assert np.all(out[np.where(out_vis[:, 0] == 0)] == 0)

    perm = flip_pairs_to_perm(5, pairs)
    got, got_vis = fliplr_joints_jax(jnp.array(joints)[None], jnp.array(vis)[None],
                                     width, perm)
    np.testing.assert_allclose(np.asarray(got)[0], out, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_vis)[0], out_vis, atol=1e-6)


def test_xywh2cs_inflation_and_aspect():
    c, s = xywh2cs(10, 20, 50, 100, aspect_ratio=0.75, scale_thre=1.25)
    np.testing.assert_allclose(c, [35.0, 70.0])
    # w < ar*h -> w = h*ar = 75 ; scale=(75/200, 100/200) * 1.25
    np.testing.assert_allclose(s, [75 / 200 * 1.25, 100 / 200 * 1.25], rtol=1e-6)
