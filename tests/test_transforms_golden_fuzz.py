"""Golden differential fuzz: geometry.py vs the reference's own transforms.py.

tests/test_geometry.py checks our closed-form affine against a REBUILT
3-point-cv2 oracle; this suite removes the rebuild from the loop and compares
directly against /root/reference/lib/utils/transforms.py (importable numpy +
cv2 + torch) on randomized centers/scales/rotations/shifts:

  get_affine_transform / affine_transform / transform_preds / fliplr_joints /
  flip_back (vs our inline NHWC flip formula, core/function.py:124).

Tolerance: the reference solves the affine from three cv2 Point2f's (float32),
so agreement is ~1e-4 relative, not exact.
"""

import importlib.util
import sys

import numpy as np
import pytest

from buctd_tpu import geometry

J = 17
COCO_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
              [15, 16]]


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "ref_transforms", "/root/reference/lib/utils/transforms.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_transforms"] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_cs(rng):
    center = rng.rand(2) * 800 + 50
    scale = np.array([rng.rand() * 3 + 0.3] * 2)
    scale[1] *= rng.choice([1.0, 1.0, 1.25])   # non-square scales occur too
    return center, scale


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("inv", [0, 1])
def test_get_affine_transform_golden(ref, seed, inv):
    rng = np.random.RandomState(seed)
    center, scale = _random_cs(rng)
    rot = float(rng.uniform(-60, 60))
    shift = rng.uniform(-0.1, 0.1, 2)
    out_size = np.array([288, 384])
    want = ref.get_affine_transform(center, scale, rot, out_size,
                                    shift=shift, inv=inv)
    got = geometry.make_affine(center, scale, rot, out_size,
                               shift=shift, inv=bool(inv))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    # and the transforms agree where it matters: on transformed points
    pts = rng.rand(20, 2) * 1000
    want_pts = np.array([ref.affine_transform(p, want) for p in pts])
    got_pts = geometry.affine_transform_points(pts, got)
    np.testing.assert_allclose(got_pts, want_pts, rtol=1e-4, atol=5e-2)


@pytest.mark.parametrize("seed", range(10))
def test_transform_preds_golden(ref, seed):
    rng = np.random.RandomState(100 + seed)
    center, scale = _random_cs(rng)
    coords = rng.rand(J, 2) * [72, 96]
    want = ref.transform_preds(coords.copy(), center, scale, [72, 96])
    got = geometry.transform_preds(coords.copy(), center, scale, [72, 96])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize("seed", range(10))
def test_fliplr_joints_golden(ref, seed):
    rng = np.random.RandomState(200 + seed)
    joints = rng.rand(J, 3) * [288, 384, 0] + [0, 0, 0]
    joints[:, 2] = 0.0
    vis = np.repeat((rng.rand(J, 1) < 0.7).astype(np.float64), 3, axis=1)
    # the reference mutates both arrays in place — copies per side
    want_j, want_v = ref.fliplr_joints(joints.copy(), vis.copy(), 288,
                                       COCO_PAIRS)
    got_j, got_v = geometry.fliplr_joints(joints.copy(), vis.copy(), 288,
                                          COCO_PAIRS)
    np.testing.assert_allclose(got_j, want_j)
    np.testing.assert_allclose(got_v, want_v)


@pytest.mark.parametrize("seed", range(6))
def test_flip_back_golden(ref, seed):
    """Our inline NHWC flip-test formula (core/function.py:124:
    ``out[:, :, ::-1, :][..., perm]``) == reference flip_back on NCHW."""
    rng = np.random.RandomState(300 + seed)
    hm = rng.rand(2, J, 24, 18)                      # (B, J, h, w)
    want = ref.flip_back(hm.copy(), COCO_PAIRS)
    perm = geometry.flip_pairs_to_perm(J, COCO_PAIRS)
    nhwc = hm.transpose(0, 2, 3, 1)
    got = nhwc[:, :, ::-1, :][..., perm].transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want)
