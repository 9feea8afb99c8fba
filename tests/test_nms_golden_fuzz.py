"""Golden differential fuzz: ops/nms.py vs the reference's own numpy NMS.

The reference's lib/nms/nms.py is pure numpy apart from its top-level Cython
imports (cpu_nms/gpu_nms), so we load it with stub modules and compare our
re-vectorized oks_iou / oks_nms / soft_oks_nms / oks_merge / rescore against
it verbatim on randomized keypoint databases — including the in_vis_thre
quirk path (reference nms.py:84-92, reproduced at ops/nms.py:99-102).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from buctd_tpu.ops import nms as ours

J = 17


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refnmspkg")
    pkg.__path__ = ["/root/reference/lib/nms"]
    sys.modules.setdefault("refnmspkg", pkg)
    for name in ("cpu_nms", "gpu_nms"):
        stub = types.ModuleType(f"refnmspkg.{name}")
        setattr(stub, name, lambda *a, **k: None)
        sys.modules.setdefault(f"refnmspkg.{name}", stub)
    spec = importlib.util.spec_from_file_location(
        "refnmspkg.nms", "/root/reference/lib/nms/nms.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refnmspkg.nms"] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_db(rng, n, tie_scores=True):
    """Clustered poses so OKS overlaps actually span (0, 1)."""
    db = []
    centers = rng.rand(max(n // 3, 1), 2) * 300 + 100
    for _ in range(n):
        c = centers[rng.randint(len(centers))]
        k = np.zeros((J, 3))
        k[:, 0] = c[0] + rng.randn(J) * rng.choice([2.0, 10.0, 40.0])
        k[:, 1] = c[1] + rng.randn(J) * rng.choice([2.0, 10.0, 40.0])
        k[:, 2] = rng.choice([0.0, 0.15, 0.5, 0.95], size=J)
        s = float(rng.rand())
        db.append({"keypoints": k,
                   "score": round(s, 1) if tie_scores else s,
                   "area": float(rng.rand() * 6000 + 300)})
    return db


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("in_vis_thre", [None, 0.2])
def test_oks_iou_golden(ref, seed, in_vis_thre):
    rng = np.random.RandomState(seed)
    db = _random_db(rng, 6)
    g = db[0]["keypoints"].flatten()
    d = np.array([e["keypoints"].flatten() for e in db[1:]])
    a_g = db[0]["area"]
    a_d = np.array([e["area"] for e in db[1:]])
    want = ref.oks_iou(g, d, a_g, a_d, None, in_vis_thre)
    got = ours.oks_iou(g, d, a_g, a_d, None, in_vis_thre)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("thresh", [0.3, 0.7, 0.9])
def test_oks_nms_golden(ref, seed, thresh):
    rng = np.random.RandomState(100 + seed)
    db = _random_db(rng, rng.randint(1, 12))
    for vis in (None, 0.2):
        want = list(ref.oks_nms(db, thresh, None, vis))
        got = list(ours.oks_nms(db, thresh, None, vis))
        assert got == want, (seed, thresh, vis)


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("thresh", [0.3, 0.7])
def test_soft_oks_nms_golden(ref, seed, thresh):
    rng = np.random.RandomState(200 + seed)
    # >20 entries exercises the reference's hard-coded max_dets=20 cap
    db = _random_db(rng, rng.randint(1, 26), tie_scores=False)
    want = np.asarray(ref.soft_oks_nms(db, thresh)).tolist()
    got = np.asarray(ours.soft_oks_nms(db, thresh)).tolist()
    assert got == want, (seed, thresh)


@pytest.mark.parametrize("seed", range(8))
def test_oks_merge_golden(ref, seed):
    rng = np.random.RandomState(300 + seed)
    db0 = _random_db(rng, rng.randint(0, 8))
    db1 = _random_db(rng, rng.randint(0, 8))

    def key(e):
        return (e["score"], e["area"], e["keypoints"].tobytes())

    # the reference APPENDS to kpts_db_mode1 in place — hand each side its
    # own copy of the input lists (dicts can be shared; they're not mutated)
    want = ref.oks_merge(list(db0), list(db1), 0.5)
    got = ours.oks_merge(list(db0), list(db1), 0.5)
    assert [key(e) for e in got] == [key(e) for e in want], seed


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("kind", ["gaussian", "linear"])
def test_rescore_golden(ref, seed, kind):
    rng = np.random.RandomState(400 + seed)
    n = 12
    overlap = rng.rand(n)
    scores = rng.rand(n)
    # both implementations mutate `scores` in place on the linear path —
    # pass each its own copy
    want = ref.rescore(overlap.copy(), scores.copy(), 0.5, kind)
    got = ours.rescore(overlap.copy(), scores.copy(), 0.5, kind)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
