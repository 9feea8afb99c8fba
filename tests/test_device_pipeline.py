"""DeviceLoader (all-on-device preprocessing) vs the host cv2 Loader: same seeds,
same records -> matching geometry and near-matching pixels."""

import numpy as np
import pytest

from test_data_pipeline import _cfg, _seed_all, _tiny_coco


def _loaders(tmp_path, train, extra=()):
    ann_file, _ = _tiny_coco(tmp_path)
    key = "TRAIN" if train else "TEST"
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                f"{key}.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                f"DATASET.{key}_IMAGE_DIR", str(tmp_path),
                f"DATASET.{key}_ANNOTATION_FILE", ann_file,
                *extra])
    from buctd_tpu.data import Loader, get_dataset
    from buctd_tpu.data.device_pipeline import DeviceLoader
    ds = get_dataset(cfg, is_train=train)
    host = Loader(ds, cfg, batch_size=4, num_workers=1)
    dev = DeviceLoader(ds, cfg, batch_size=4, num_workers=1)
    return host, dev


def test_device_pipeline_eval_matches_host(tmp_path):
    host, dev = _loaders(tmp_path, train=False)
    _seed_all(3)
    hb = next(iter(host))
    _seed_all(3)
    db = next(iter(dev))

    np.testing.assert_allclose(db["joints"], hb["joints"], atol=1e-4)
    np.testing.assert_allclose(db["cond_joints"], hb["cond_joints"], atol=1e-4)
    np.testing.assert_allclose(db["center"], hb["center"], atol=1e-4)
    hi, di = np.asarray(hb["input"]), np.asarray(db["input"])
    assert hi.shape == di.shape
    err = np.abs(hi - di)
    # rot = 0 at eval: warps agree except occasional 1-LSB rounding at boundaries
    assert np.mean(err < 0.02) > 0.995 and err.max() < 0.2, err.max()
    np.testing.assert_allclose(np.asarray(db["target"]), np.asarray(hb["target"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(db["target_weight"]),
                               np.asarray(hb["target_weight"]), atol=1e-6)


def test_device_pipeline_train_matches_host(tmp_path):
    # full augmentation incl. flips, crop-aug masking, rotations
    host, dev = _loaders(tmp_path, train=True,
                         extra=["DATASET.SYNTHESIS_POSE", "True"])
    _seed_all(7)
    hb = next(iter(host))
    _seed_all(7)
    db = next(iter(dev))

    np.testing.assert_allclose(db["joints"], hb["joints"], atol=1e-3)
    np.testing.assert_allclose(db["cond_joints"], hb["cond_joints"], atol=1e-3)
    np.testing.assert_allclose(db["rotation"], hb["rotation"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(db["target"]), np.asarray(hb["target"]),
                               atol=1e-4)
    hi, di = np.asarray(hb["input"])[..., :3], np.asarray(db["input"])[..., :3]
    rot = np.asarray(hb["rotation"])
    for k in range(hi.shape[0]):
        err = np.abs(hi[k] - di[k])
        if abs(rot[k]) < 1e-6:  # unrotated: near-exact
            assert np.mean(err < 0.02) > 0.99, (k, err.max())
        else:  # rotated: parallelogram vs square bilinear footprint
            assert err.mean() < 0.15, (k, rot[k], err.mean())
    # condition channels identical (rendered from the same crop-frame joints)
    np.testing.assert_allclose(np.asarray(db["input"])[..., 3:],
                               np.asarray(hb["input"])[..., 3:], atol=1e-3)
