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


def test_pose_estimator_compile_budget():
    """A stream of varied shapes compiles a BOUNDED number of programs: once
    max_compiles is spent, new shapes pad up into an already-compiled bucket,
    and shapes no compiled bucket contains raise instead of compiling."""
    import pytest

    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    est = PoseEstimator(cfg, refine_iters=1, max_compiles=2,
                        precompile=[(256, 256, 4)])
    assert est._compiled == {(256, 256, 4)}

    rng = np.random.RandomState(0)
    img_small = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
    img_big = rng.randint(0, 255, (300, 400, 3)).astype(np.uint8)
    conds = rng.uniform(20, 90, (16, 17, 2)).astype(np.float32)

    # fits the precompiled bucket exactly (P=3 -> pose bucket 4) -> no new compile
    est.predict(img_small, conds[:3])
    assert len(est._compiled) == 1
    # second distinct shape -> second (and last allowed) compile
    est.predict(img_big, conds[:3])
    assert len(est._compiled) == 2
    # budget spent: (256,256,2) pads up into (256,256,4) instead of compiling
    out = est.predict(img_small, conds[:2])
    assert out.shape == (2, 17, 3)
    assert len(est._compiled) == 2
    # no compiled bucket holds 16 poses -> explicit error, not a silent compile
    with pytest.raises(RuntimeError, match="max_compiles"):
        est.predict(img_small, conds)
    assert len(est._compiled) == 2


def test_pose_estimator_predict_batch_matches_per_image():
    """predict_batch groups same-bucket images into one vmapped program; results
    must match the per-image path (padded rows/poses must not leak)."""
    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    est = PoseEstimator(cfg, refine_iters=1)

    rng = np.random.RandomState(3)
    # three same-bucket images (<=256) with different true sizes + pose counts,
    # plus one odd-bucket image to exercise the grouping
    imgs = [rng.randint(0, 255, (180, 240, 3)).astype(np.uint8),
            rng.randint(0, 255, (200, 220, 3)).astype(np.uint8),
            rng.randint(0, 255, (160, 256, 3)).astype(np.uint8),
            rng.randint(0, 255, (300, 380, 3)).astype(np.uint8)]
    conds = [rng.uniform(30, 150, (2, 17, 2)).astype(np.float32),
             rng.uniform(30, 150, (3, 17, 2)).astype(np.float32),
             rng.uniform(30, 150, (1, 17, 2)).astype(np.float32),
             rng.uniform(30, 250, (2, 17, 2)).astype(np.float32)]

    batched = est.predict_batch(imgs, conds)
    for i, (im, cs) in enumerate(zip(imgs, conds)):
        single = est.predict(im, cs)
        assert batched[i].shape == single.shape
        np.testing.assert_allclose(batched[i], single, atol=1e-3, rtol=1e-3)


def test_pose_estimator_predict_batch_remainder_reuses_count_bucket():
    """A remainder chunk (len < any count bucket boundary it hashed to) rides
    the smallest ALREADY-COMPILED count bucket via row padding instead of
    compiling a fresh (n, h, w, p) shape (round-4 bench_serve found 6 surprise
    compiles from chunk epilogues)."""
    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    est = PoseEstimator(cfg, refine_iters=1, precompile=[(4, 256, 256, 4)])
    assert est._compiled == {(4, 256, 256, 4)}

    rng = np.random.RandomState(6)
    imgs = [rng.randint(0, 255, (180, 240, 3)).astype(np.uint8)
            for _ in range(3)]
    conds = [rng.uniform(30, 150, (3, 17, 2)).astype(np.float32)
             for _ in range(3)]                 # 3 poses -> pose bucket 4
    out = est.predict_batch(imgs, conds)   # nb buckets to 4 — precompiled
    assert est._compiled == {(4, 256, 256, 4)}, est._compiled
    assert all(o.shape == (3, 17, 3) for o in out)

    # a 2-image chunk would bucket to nb=2 — it must ride the compiled
    # 4-bucket via row padding instead of compiling (2, 256, 256, 4)
    est.predict_batch(imgs[:2], conds[:2])
    assert est._compiled == {(4, 256, 256, 4)}, est._compiled


def test_pose_estimator_predict_batch_coam_flash(monkeypatch):
    """Batched serving of an ATTENTION model with the flash engine forced:
    predict_batch vmaps the whole refine loop, so the flash kernel must vmap
    (custom_vmap BH-fold rule — round 4; the raw custom_partitioning has no
    batching rule and died with NotImplementedError on the TPU)."""
    from buctd_tpu.serving import PoseEstimator

    monkeypatch.setenv("BUCTD_ATTENTION_ENGINE", "flash")
    cfg = _cfg(TINY + ["MODEL.NAME", "pose_hrnet_coam"])
    est = PoseEstimator(cfg, refine_iters=1)

    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 255, (180, 240, 3)).astype(np.uint8),
            rng.randint(0, 255, (200, 220, 3)).astype(np.uint8)]
    conds = [rng.uniform(30, 150, (2, 17, 2)).astype(np.float32),
             rng.uniform(30, 150, (2, 17, 2)).astype(np.float32)]
    batched = est.predict_batch(imgs, conds)
    for i, (im, cs) in enumerate(zip(imgs, conds)):
        single = est.predict(im, cs)
        np.testing.assert_allclose(batched[i], single, atol=1e-3, rtol=1e-3)


def test_pose_estimator_predict_batch_budget_fallback():
    """When the compile budget blocks a batched shape, those images fall back
    to the per-image path instead of compiling."""
    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    est = PoseEstimator(cfg, refine_iters=1, max_compiles=1)

    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 255, (120, 140, 3)).astype(np.uint8)
            for _ in range(2)]
    conds = [rng.uniform(20, 100, (2, 17, 2)).astype(np.float32)
             for _ in range(2)]
    est.predict(imgs[0], conds[0])          # spends the 1-compile budget
    assert len(est._compiled) == 1
    out = est.predict_batch(imgs, conds)    # batch shape blocked -> per-image
    assert all(o.shape == (2, 17, 3) for o in out)
    # still only the single (256,256,2) program; no (2,...) batch key compiled
    assert all(len(k) == 3 for k in est._compiled)
    assert len(est._compiled) == 1


def test_pose_estimator_mesh_data_parallel_matches_single():
    """With a mesh, predict_batch shards image rows over the data axis (the
    TPU-native analog of the reference's eval nn.DataParallel, tools/test.py:134)
    and must produce the same predictions as the unsharded estimator."""
    import jax

    from buctd_tpu.parallel.mesh import make_mesh
    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    mesh = make_mesh()                       # 8 virtual CPU devices (conftest)
    est_dp = PoseEstimator(cfg, refine_iters=1, mesh=mesh)
    est = PoseEstimator(cfg, refine_iters=1)
    # count buckets scale to mesh multiples so every device gets whole rows
    assert est_dp.count_buckets[0] == mesh.size

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, (120 + 10 * i, 140, 3)).astype(np.uint8)
            for i in range(mesh.size)]
    conds = [rng.uniform(20, 100, (1 + i % 3, 17, 2)).astype(np.float32)
             for i in range(mesh.size)]
    out_dp = est_dp.predict_batch(imgs, conds)
    out = est.predict_batch(imgs, conds)
    for a, b in zip(out_dp, out):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)
    # the batched program really ran sharded: its image-count bucket is a
    # whole multiple of the mesh
    nkeys = [k for k in est_dp._compiled if len(k) == 4]
    assert nkeys and all(k[0] % mesh.size == 0 for k in nkeys)
    # params for the batched path are replicated over the mesh
    leaf = jax.tree.leaves(est_dp._mesh_vars)[0]
    assert len(leaf.sharding.device_set) == mesh.size


def test_pose_estimator_batched_precompile():
    """A 4-tuple precompile entry warms the batched program; a subsequent
    predict_batch at that shape reuses it (no budget growth)."""
    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg(TINY)
    est = PoseEstimator(cfg, refine_iters=1, max_compiles=2,
                        precompile=[(2, 256, 256, 2)])
    assert (2, 256, 256, 2) in est._compiled

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (150, 180, 3)).astype(np.uint8)
            for _ in range(2)]
    conds = [rng.uniform(20, 120, (2, 17, 2)).astype(np.float32)
             for _ in range(2)]
    out = est.predict_batch(imgs, conds)
    assert all(o.shape == (2, 17, 3) for o in out)
    assert est._compiled == {(2, 256, 256, 2)}
