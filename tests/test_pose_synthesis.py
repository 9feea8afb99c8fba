"""Statistical parity of the condition-noise sampler vs the reference implementation.

The sampler is stochastic, so parity is distributional: run both on the same scenario
and compare per-mode frequencies (good/jitter vs miss/swap distance buckets, inversion
rate, zero rate) within loose tolerances.
"""

import importlib.util
import types

import numpy as np
import pytest

from buctd_tpu.data.pose_synthesis import synthesize_pose


def _ref_module():
    spec = importlib.util.spec_from_file_location(
        "ref_pose_synthesis", "/root/reference/lib/dataset/pose_synthesis.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cfg(dataset, J):
    return types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NUM_JOINTS=J),
        DATASET=types.SimpleNamespace(DATASET=dataset))


def _coco_scenario(rng):
    J = 17
    joints = np.zeros((J, 3))
    joints[:, 0] = rng.uniform(100, 200, J)
    joints[:, 1] = rng.uniform(100, 300, J)
    joints[:, 2] = 2
    est = joints.copy()
    near = joints[None].copy()
    near[0, :, 0] += 60  # one overlapping neighbour
    area = 150 * 250
    return joints, est, near, area


def _mode_stats(samples, joints, area, sigmas):
    """Classify each synthesized joint by distance from GT into rough mode buckets."""
    var = (sigmas * 2) ** 2
    ks50 = np.sqrt(-2 * area * var * np.log(0.50))
    ks85 = np.sqrt(-2 * area * var * np.log(0.85))
    d = np.linalg.norm(samples[..., :2] - joints[None, :, :2], axis=-1)
    zero = (samples[..., 2] == 0)
    good = (d <= ks85) & ~zero
    jitter = (d > ks85) & (d <= ks50) & ~zero
    far = (d > ks50) & ~zero
    return np.array([good.mean(), jitter.mean(), far.mean(), zero.mean()])


@pytest.mark.slow
def test_coco_sampler_distribution_matches_reference():
    ref = _ref_module()
    rng = np.random.RandomState(7)
    joints, est, near, area = _coco_scenario(rng)
    cfg = _cfg("coco", 17)
    from buctd_tpu.data.pose_synthesis import COCO_SIGMAS

    n = 150
    np.random.seed(3)
    ours = np.stack([synthesize_pose(cfg, joints, est, near, area, 1) for _ in range(n)])
    np.random.seed(3)
    import random
    random.seed(3)
    theirs = np.stack([ref.synthesize_pose(cfg, joints, est, near, area, 1)
                       for _ in range(n)])

    s_ours = _mode_stats(ours, joints, area, COCO_SIGMAS)
    s_ref = _mode_stats(theirs, joints, area, COCO_SIGMAS)
    # good/jitter/far(miss+swap+inv)/zero rates agree to a few percent
    np.testing.assert_allclose(s_ours, s_ref, atol=0.05)


def test_crowdpose_and_generic_variants_run():
    rng = np.random.RandomState(0)
    for ds, J in [("crowdpose", 14), ("fish", 7)]:
        joints = np.zeros((J, 3))
        joints[:, :2] = rng.uniform(50, 150, (J, 2))
        joints[:, 2] = 2
        cfg = _cfg(ds, J)
        out = synthesize_pose(cfg, joints, joints, joints[None], 10000, 0,
                              rng=np.random.RandomState(1))
        assert out.shape == (J, 3)
        assert np.isfinite(out).all()
        # visible input joints should mostly stay near their GT (good+jitter dominate)
        d = np.linalg.norm(out[:, :2] - joints[:, :2], axis=-1)
        assert (d < 500).all()


def test_invisible_joints_fall_back_to_estimate():
    J = 17
    joints = np.zeros((J, 3))
    joints[:, :2] = 100.0
    joints[:5, 2] = 0  # invisible face joints
    joints[5:, 2] = 2
    est = joints.copy()
    est[:, :2] = 200.0
    cfg = _cfg("coco", J)
    out = synthesize_pose(cfg, joints, est, np.zeros((0, J, 3)), 40000, 0,
                          rng=np.random.RandomState(2))
    # invisible joints seeded from the estimate, so samples cluster near (200, 200)
    vis_d = np.linalg.norm(out[:5, :2] - 200.0, axis=-1)
    live = out[:5, 2] > 0
    assert live.any()
    assert (vis_d[live] < 150).all()
