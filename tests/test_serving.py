"""PoseEstimator serving API: shape bucketing, jit-cache reuse, refine integration."""

import numpy as np

from test_data_pipeline import _cfg
from test_refine import TINY


def test_pose_estimator_buckets_and_predicts():
    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    est = PoseEstimator(cfg, refine_iters=2)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (200, 300, 3)).astype(np.uint8)
    conds = rng.uniform(40, 180, (3, 17, 2)).astype(np.float32)
    out = est.predict(img, conds)
    assert out.shape == (3, 17, 3)
    assert np.isfinite(out).all()

    # different P but same buckets -> same compiled program (just runs)
    out2 = est.predict(img, conds[:2])
    assert out2.shape == (2, 17, 3)
    # single pose as (J, 2)
    out3 = est.predict(img, conds[0])
    assert out3.shape == (1, 17, 3)
    # padded poses must not affect real ones: first pose identical in both calls
    np.testing.assert_allclose(out2[0], out[0], atol=1e-4)
