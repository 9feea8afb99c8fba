"""Golden differential fuzz: ops/decode.py + core/metrics.py vs the
reference's own core/inference.py and core/evaluate.py.

tests/test_ops.py checks decode against REBUILT numpy oracles; this suite
imports the reference modules themselves (pure numpy + cv2; inference.py
needs utils.transforms on sys.path) and fuzzes:

  get_max_preds / get_final_preds (argmax + ±0.25 nudge + inverse affine)
  get_final_preds_dark (DARK: gaussian_blur + log + taylor)
  accuracy (heatmap PCK@0.5, incl. the swapped [h, w]/10 norm quirk)

on randomized gaussian-bump heatmaps.  Tolerance ~1e-3 px: the reference's
transform_preds solves its affine from three cv2 Point2f's (float32) and our
decode runs in f32 jax.
"""

import importlib.util
import sys

import numpy as np
import pytest

ref_inference = None
ref_evaluate = None


def setup_module():
    global ref_inference, ref_evaluate
    if "/root/reference/lib" not in sys.path:
        sys.path.insert(0, "/root/reference/lib")
    for name, path in [("ref_core_inference",
                        "/root/reference/lib/core/inference.py"),
                       ("ref_core_evaluate",
                        "/root/reference/lib/core/evaluate.py")]:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    ref_inference = sys.modules["ref_core_inference"]
    ref_evaluate = sys.modules["ref_core_evaluate"]
    # evaluate.py re-imports get_max_preds via 'core.inference'; make the two
    # modules agree on one implementation
    ref_evaluate.get_max_preds = ref_inference.get_max_preds


class _Cfg:
    class TEST:
        POST_PROCESS = True


def _bump_heatmaps(rng, B=3, J=17, h=24, w=18):
    """Gaussian bumps with jittered peaks + noise; some channels all-negative
    (exercises the maxvals<=0 masking) and some peaks near borders
    (exercises the nudge/taylor in-bounds guards)."""
    hm = rng.randn(B, J, h, w).astype(np.float32) * 0.05
    ys, xs = np.mgrid[0:h, 0:w]
    for b in range(B):
        for j in range(J):
            if rng.rand() < 0.1:
                hm[b, j] -= 1.0          # no positive peak
                continue
            cy, cx = rng.rand() * (h - 1), rng.rand() * (w - 1)
            hm[b, j] += np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2)
                               / (2 * 2.0 ** 2)).astype(np.float32)
    return hm


def _random_cs(rng, B):
    centers = rng.rand(B, 2).astype(np.float32) * 600 + 100
    scales = (rng.rand(B, 2).astype(np.float32) * 2 + 0.5)
    scales[:, 1] = scales[:, 0]
    return centers, scales


@pytest.mark.parametrize("seed", range(8))
def test_get_max_preds_golden(seed):
    from buctd_tpu.ops.decode import get_max_preds

    rng = np.random.RandomState(seed)
    hm = _bump_heatmaps(rng)
    want_p, want_v = ref_inference.get_max_preds(hm.copy())
    got_p, got_v = map(np.asarray, get_max_preds(hm))
    np.testing.assert_allclose(got_p, want_p)
    np.testing.assert_allclose(got_v, want_v.astype(np.float32), atol=1e-6)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("post_process", [True, False])
def test_get_final_preds_golden(seed, post_process):
    from buctd_tpu.ops import get_final_preds

    rng = np.random.RandomState(100 + seed)
    hm = _bump_heatmaps(rng)
    B, J, h, w = hm.shape
    centers, scales = _random_cs(rng, B)

    cfg = _Cfg()
    cfg.TEST.POST_PROCESS = post_process
    want_p, want_v = ref_inference.get_final_preds(
        cfg, hm.copy(), centers.copy(), scales.copy())
    got_p, got_v = map(np.asarray, get_final_preds(
        hm, centers, scales, (w, h), post_process=post_process,
        use_dark=False))
    np.testing.assert_allclose(got_p, want_p, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(got_v.squeeze(-1), want_v.squeeze(-1),
                               atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_get_final_preds_dark_golden(seed):
    from buctd_tpu.ops import get_final_preds

    rng = np.random.RandomState(200 + seed)
    hm = _bump_heatmaps(rng)
    B, J, h, w = hm.shape
    centers, scales = _random_cs(rng, B)

    want_p, want_v = ref_inference.get_final_preds_dark(
        _Cfg(), hm.copy(), centers.copy(), scales.copy())
    got_p, got_v = map(np.asarray, get_final_preds(
        hm, centers, scales, (w, h), use_dark=True))
    # DARK runs a cv2 GaussianBlur + log + 2nd-order taylor step; our blur is
    # an exact separable replication but accumulates in f32 on device
    np.testing.assert_allclose(got_p, want_p, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(got_v.squeeze(-1), want_v.squeeze(-1),
                               atol=1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_pck_accuracy_golden(seed):
    from buctd_tpu.core.metrics import pck_accuracy

    rng = np.random.RandomState(300 + seed)
    pred_hm = _bump_heatmaps(rng)
    # targets: clean bumps, a few empty channels (gt coords <= 1 -> excluded)
    tgt_hm = _bump_heatmaps(rng)
    want_acc, want_avg, want_cnt, want_pred = ref_evaluate.accuracy(
        pred_hm.copy(), tgt_hm.copy())
    got_avg, got_cnt, got_pred = pck_accuracy(pred_hm, tgt_hm)
    assert float(got_avg) == pytest.approx(want_avg, abs=1e-6)
    assert int(got_cnt) == want_cnt
    np.testing.assert_allclose(np.asarray(got_pred), want_pred)
