"""Exported serving artifacts: jax.export roundtrip parity with the live
PoseEstimator, bucketing/padding contract, batched programs, CLI smoke."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from test_data_pipeline import _cfg
from test_refine import TINY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One TINY-model artifact (a 256x256x4 single program + a 2-row batched
    program) shared by the roundtrip tests, plus the live estimator it came
    from."""
    from buctd_tpu.serving import PoseEstimator
    from buctd_tpu.serving_export import export_estimator

    out = str(tmp_path_factory.mktemp("export"))
    est = PoseEstimator(_cfg(TINY), refine_iters=2)
    manifest = export_estimator(est, [(256, 256, 4), (2, 256, 256, 4)], out,
                                platforms=("cpu",))
    return est, out, manifest


def test_export_roundtrip_matches_live(artifact):
    from buctd_tpu.serving_export import ExportedPoseEstimator

    est, out, manifest = artifact
    assert manifest["format_version"] == 1
    assert [256, 256, 4] in manifest["programs"]
    assert manifest["refine_iters"] == 2
    assert os.path.exists(os.path.join(out, "prog_256x256x4.shlo"))
    assert os.path.exists(os.path.join(out, "params.npz"))

    loaded = ExportedPoseEstimator(out)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (200, 220, 3)).astype(np.uint8)
    conds = rng.uniform(30, 180, (3, 17, 2)).astype(np.float32)
    want = est.predict(img, conds)          # live: traces flax modules
    got = loaded.predict(img, conds)        # artifact: deserialized StableHLO
    assert got.shape == (3, 17, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # single pose as (J, 2) + pose-bucket padding, same contract as serving.py
    np.testing.assert_allclose(loaded.predict(img, conds[0]),
                               est.predict(img, conds[0]), atol=1e-5)


def test_export_no_containing_bucket_raises(artifact):
    from buctd_tpu.serving_export import ExportedPoseEstimator

    _, out, _ = artifact
    loaded = ExportedPoseEstimator(out)
    rng = np.random.RandomState(1)
    big = rng.randint(0, 255, (400, 400, 3)).astype(np.uint8)
    conds = rng.uniform(30, 180, (2, 17, 2)).astype(np.float32)
    with pytest.raises(RuntimeError, match="no exported program"):
        loaded.predict(big, conds)
    # too many poses for the exported p-bucket also raises
    many = rng.uniform(30, 180, (9, 17, 2)).astype(np.float32)
    with pytest.raises(RuntimeError, match="no exported program"):
        loaded.predict(rng.randint(0, 255, (100, 100, 3)).astype(np.uint8),
                       many)


def test_export_predict_batch_uses_batched_program(artifact):
    from buctd_tpu.serving_export import ExportedPoseEstimator

    est, out, _ = artifact
    loaded = ExportedPoseEstimator(out)
    rng = np.random.RandomState(2)
    images = [rng.randint(0, 255, (180 + 10 * i, 200, 3)).astype(np.uint8)
              for i in range(3)]
    conds = [rng.uniform(30, 170, (1 + i, 17, 2)).astype(np.float32)
             for i in range(3)]
    got = loaded.predict_batch(images, conds)
    want = est.predict_batch(images, conds)
    assert len(got) == 3
    for g, w, c in zip(got, want, conds):
        assert g.shape == (len(c), 17, 3)
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_export_coam_flagship_roundtrip(tmp_path):
    """The OCHuman flagship (pose_hrnet_coam) exports and round-trips too —
    via the PoseEstimator.export convenience method, with refine_iters=3
    (the published OCHuman protocol, reference README.md:104)."""
    from buctd_tpu.serving import PoseEstimator
    from buctd_tpu.serving_export import ExportedPoseEstimator

    cfg = _cfg(TINY + ["MODEL.NAME", "pose_hrnet_coam",
                       "MODEL.ATT_MODULES", "[False, True, False, False]"])
    est = PoseEstimator(cfg, refine_iters=3)
    out = str(tmp_path / "coam")
    manifest = est.export([(256, 256, 4)], out, platforms=("cpu",))
    assert manifest["model_name"] == "pose_hrnet_coam"
    assert manifest["refine_iters"] == 3
    loaded = ExportedPoseEstimator(out)
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (190, 210, 3)).astype(np.uint8)
    conds = rng.uniform(30, 180, (2, 17, 2)).astype(np.float32)
    np.testing.assert_allclose(loaded.predict(img, conds),
                               est.predict(img, conds), atol=1e-5)


def test_export_batched_only_artifact_serves_single_image(tmp_path):
    """An artifact holding ONLY a batched program still serves a lone image
    through predict_batch (pad rows), and predict() raises with guidance."""
    from buctd_tpu.serving import PoseEstimator
    from buctd_tpu.serving_export import (ExportedPoseEstimator,
                                          export_estimator)

    est = PoseEstimator(_cfg(TINY), refine_iters=1)
    out = str(tmp_path / "batched_only")
    export_estimator(est, [(2, 256, 256, 4)], out, platforms=("cpu",))
    loaded = ExportedPoseEstimator(out)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (150, 160, 3)).astype(np.uint8)
    conds = rng.uniform(30, 140, (2, 17, 2)).astype(np.float32)
    with pytest.raises(RuntimeError, match="no exported program"):
        loaded.predict(img, conds)
    got = loaded.predict_batch([img], [conds])
    assert got[0].shape == (2, 17, 3)
    np.testing.assert_allclose(got[0], est.predict(img, conds), atol=1e-5)


def test_export_format_version_guard(artifact, tmp_path):
    from buctd_tpu.serving_export import ExportedPoseEstimator

    _, out, _ = artifact
    bad = tmp_path / "bad"
    bad.mkdir()
    for name in os.listdir(out):
        os.symlink(os.path.join(out, name), bad / name)
    os.unlink(bad / "manifest.json")
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    m["format_version"] = 99
    with open(bad / "manifest.json", "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format 99"):
        ExportedPoseEstimator(str(bad))


@pytest.mark.slow
def test_export_cli_selftest_and_serve(tmp_path):
    """tools/export.py --selftest then tools/serve.py --exported on the
    artifact: the full no-model-code deployment path."""
    import cv2

    env = dict(os.environ, BUCTD_FORCE_CPU="1")
    art = str(tmp_path / "artifact")
    tiny = ["MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
            "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
            "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True"]
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/export.py"),
         "--cfg",
         os.path.join(REPO, "experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml"),
         "--out", art, "--shape", "256x256x4", "--platforms", "cpu",
         "--selftest", *tiny],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(REPO, "tools"), timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "selftest ok" in r.stdout

    rng = np.random.RandomState(0)
    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, rng.randint(0, 255, (200, 220, 3)).astype(np.uint8))
    manifest = [{"image": img_path,
                 "poses": rng.uniform(30, 180, (2, 17, 2)).tolist()}]
    man_path = str(tmp_path / "requests.json")
    with open(man_path, "w") as f:
        json.dump(manifest, f)
    out_path = str(tmp_path / "results.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/serve.py"),
         "--exported", art, "--manifest", man_path, "--out", out_path],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(REPO, "tools"), timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out_path) as f:
        results = json.load(f)
    preds = np.asarray(results[0]["predictions"], np.float64)
    assert preds.shape == (2, 17, 3)
    assert np.isfinite(preds).all()
