"""NMS-family tests vs brute-force oracles."""

import numpy as np

from buctd_tpu.ops.nms import (COCO_SIGMAS, box_nms_jax, nms, oks_iou, oks_merge,
                               oks_nms, rescore, soft_oks_nms)

RNG = np.random.RandomState(7)


def _rand_dets(n):
    x1 = RNG.rand(n) * 100
    y1 = RNG.rand(n) * 100
    w = RNG.rand(n) * 50 + 5
    h = RNG.rand(n) * 50 + 5
    s = RNG.rand(n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], -1).astype(np.float32)


def test_box_nms_matches_jax():
    for n in (1, 5, 40):
        dets = _rand_dets(n)
        for thresh in (0.3, 0.5, 0.7):
            want = nms(dets, thresh)
            got = box_nms_jax(dets, thresh).tolist()
            assert got == want, (n, thresh)


def test_box_nms_empty():
    assert nms(np.zeros((0, 5)), 0.5) == []
    assert box_nms_jax(np.zeros((0, 5)), 0.5).tolist() == []


def _rand_pose(center, spread=10):
    kpts = np.zeros(17 * 3)
    kpts[0::3] = center[0] + RNG.randn(17) * spread
    kpts[1::3] = center[1] + RNG.randn(17) * spread
    kpts[2::3] = 1.0
    return kpts


def test_oks_iou_identical_is_one():
    g = _rand_pose((50, 50))
    ious = oks_iou(g, g[None], 1000.0, np.array([1000.0]))
    np.testing.assert_allclose(ious, [1.0], atol=1e-9)


def test_oks_iou_reference_formula():
    g = _rand_pose((50, 50))
    d = _rand_pose((55, 52))[None]
    a_g, a_d = 900.0, np.array([1100.0])
    got = oks_iou(g, d, a_g, a_d)
    var = (COCO_SIGMAS * 2) ** 2
    e = ((d[0, 0::3] - g[0::3]) ** 2 + (d[0, 1::3] - g[1::3]) ** 2) / var \
        / ((a_g + a_d[0]) / 2 + np.spacing(1)) / 2
    want = np.exp(-e).mean()
    np.testing.assert_allclose(got, [want], rtol=1e-12)


def _kpts_db(centers, scores, area=1000.0):
    return [{"keypoints": _rand_pose(c, spread=3), "score": s, "area": area}
            for c, s in zip(centers, scores)]


def test_oks_nms_suppresses_overlapping():
    RNG.seed(1)
    base = _rand_pose((50, 50), spread=3)
    near = base.copy()
    near[0::3] += 0.5  # nearly identical pose -> OKS ~ 1
    far = _rand_pose((200, 200), spread=3)
    db = [{"keypoints": k, "score": s, "area": 1000.0}
          for k, s in [(base, 0.9), (near, 0.8), (far, 0.7)]]
    keep = oks_nms(db, thresh=0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_oks_nms_keeps_disjoint():
    db = _kpts_db([(50, 50), (300, 300)], [0.5, 0.9])
    keep = oks_nms(db, thresh=0.5)
    assert sorted(keep) == [0, 1]
    assert keep[0] == 1  # higher score first


def test_soft_oks_nms_caps_and_orders():
    RNG.seed(2)
    centers = [(i * 40.0, i * 40.0) for i in range(25)]
    db = _kpts_db(centers, list(np.linspace(0.99, 0.2, 25)))
    keep = soft_oks_nms(db, thresh=0.9)
    assert len(keep) == 20  # max_dets cap (nms.py:180)
    assert keep[0] == 0


def test_rescore_gaussian_and_linear():
    ovr = np.array([0.2, 0.8])
    sc = np.array([1.0, 1.0])
    g = rescore(ovr, sc.copy(), 0.5)
    np.testing.assert_allclose(g, np.exp(-ovr**2 / 0.5))
    l = rescore(ovr, sc.copy(), 0.5, type="linear")
    np.testing.assert_allclose(l, [1.0, 1.0 * (1 - 0.8)], atol=1e-6)


def test_oks_merge():
    db0 = _kpts_db([(50, 50), (400, 400)], [0.9, 0.8])
    near = {"keypoints": db0[0]["keypoints"] + 0.5, "score": 0.95, "area": 1000.0}
    db1 = [near]
    merged = oks_merge(list(db0), list(db1), min_oks_thres=0.5)
    # (400,400) pose is OKS-disjoint from db1 -> appended; (50,50) overlaps -> dropped
    assert len(merged) == 2
    assert merged[0] is db1[0]


# ---------------------------------------------------------------------------
# native C++ library vs numpy reference
# ---------------------------------------------------------------------------

def _random_dets(n, seed):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    return np.stack([x1, y1, x1 + rng.uniform(5, 120, n),
                     y1 + rng.uniform(5, 120, n), rng.rand(n)], 1).astype(np.float32)


def test_native_cpu_nms_matches_numpy():
    from buctd_tpu.ops import nms as npnms
    from buctd_tpu.ops import native
    assert native.native_available(), "native library failed to build"
    for seed in range(5):
        dets = _random_dets(60, seed)
        for thresh in (0.3, 0.5, 0.7):
            assert native.cpu_nms(dets, thresh) == npnms.nms(dets, thresh)


def test_native_gpu_nms_semantics():
    """The mask kernel suppresses on ovr > thresh (CUDA semantics) and returns
    original indices in score order."""
    from buctd_tpu.ops import native
    if not native.native_available():
        import pytest
        pytest.skip("no native lib")
    dets = np.array([[0, 0, 10, 10, 0.9],
                     [1, 1, 11, 11, 0.8],     # high overlap with 0 -> suppressed
                     [100, 100, 110, 110, 0.7]], np.float32)
    assert native.gpu_nms(dets, 0.3) == [0, 2]
    # duplicate boxes with ovr exactly 1.0 > thresh
    keep = native.gpu_nms(np.repeat(dets[:1], 3, 0), 0.99)
    assert len(keep) == 1
