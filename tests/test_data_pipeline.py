"""Data-layer tests: golden per-sample parity vs the reference JointsDataset, tiny
synthetic COCO dataset end-to-end (db -> loader -> evaluate -> AP)."""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

from buctd_tpu.config import default_config, update_config


def _cfg(opts=()):
    cfg = default_config()
    args = types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml",
        opts=list(opts), modelDir="", logDir="", dataDir="")
    update_config(cfg, args)
    return cfg


def _record(img_path, rng, J=17, with_cond=True):
    joints = np.zeros((J, 3))
    joints[:, 0] = rng.uniform(30, 130, J)
    joints[:, 1] = rng.uniform(30, 170, J)
    vis = np.zeros((J, 3))
    vis[:, :2] = 1
    rec = {
        "image": img_path,
        "center": np.array([80.0, 100.0]),
        "scale": np.array([0.8, 1.0]),
        "joints_3d": joints,
        "joints_3d_vis": vis,
        "filename": "", "imgnum": 0,
        "annotation_id": 7,
        "cond_max_iou": 0.3,
        "bbox": [20, 20, 120, 160],
        "score": 1,
    }
    if with_cond:
        rec["cond_joints"] = joints + rng.uniform(-6, 6, (J, 3)) * [1, 1, 0]
        rec["cond_joints_vis"] = vis.copy()
        rec["use_bu_bbox"] = True
        rec["near_joints"] = [joints.copy()]
        rec["best_model_key"] = ""
    return rec


def _seed_all(n):
    import random
    np.random.seed(n)
    random.seed(n)


@pytest.fixture(scope="module")
def img_file(tmp_path_factory):
    import cv2
    p = str(tmp_path_factory.mktemp("imgs") / "im.png")
    rng = np.random.RandomState(0)
    cv2.imwrite(p, rng.randint(0, 255, (200, 160, 3), np.uint8))
    return p


def _ref_joints_dataset(cfg, is_train, transform):
    sys.path.insert(0, "/root/reference/lib")
    # JointsDataset does `from .pose_synthesis import ...`; give it a parent package
    # without importing the real dataset/__init__ (which needs pycocotools)
    pkg = types.ModuleType("refds")
    pkg.__path__ = ["/root/reference/lib/dataset"]
    sys.modules.setdefault("refds", pkg)
    for name in ("pose_synthesis", "JointsDataset"):
        spec = importlib.util.spec_from_file_location(
            f"refds.{name}", f"/root/reference/lib/dataset/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refds.{name}"] = mod
        spec.loader.exec_module(mod)
    ds = mod.JointsDataset(cfg, "", "", is_train, transform)
    ds.flip_pairs = [[1, 2], [3, 4], [5, 6], [7, 8],
                     [9, 10], [11, 12], [13, 14], [15, 16]]
    ds.upper_body_ids = tuple(range(11))
    ds.lower_body_ids = tuple(range(11, 17))
    ds.aspect_ratio = cfg.MODEL.IMAGE_SIZE[0] / cfg.MODEL.IMAGE_SIZE[1]
    ds.scale_thre = cfg.TEST.SCALE_THRE
    return ds


def _torch_normalize(arr):
    """torchvision ToTensor + Normalize(imagenet), without torchvision."""
    import torch
    x = torch.from_numpy(arr.astype(np.float32).transpose(2, 0, 1) / 255.0)
    mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
    return (x - mean) / std


@pytest.mark.parametrize("is_train", [False, True])
def test_sample_parity_vs_reference(img_file, is_train):
    """Same db record + same RNG seeds -> identical crop, joints, input tensor, and
    target heatmaps as the reference pipeline (conditional colored mode)."""
    pytest.importorskip("torch")
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False"])
    rng = np.random.RandomState(3)
    rec = _record(img_file, rng)

    from buctd_tpu.data.joints_dataset import JointsDataset as OurJD
    from buctd_tpu.data.datasets.coco import COCODataset
    ours = OurJD(cfg, "", "", is_train)
    ours.flip_pairs = COCODataset.flip_pairs
    ours.upper_body_ids = COCODataset.upper_body_ids
    ours.lower_body_ids = COCODataset.lower_body_ids
    ours.db = [rec]

    ref = _ref_joints_dataset(cfg, is_train, _torch_normalize)
    ref.db = [rec]

    _seed_all(11)
    want_input, want_target, want_weight, want_meta = ref[0]

    _seed_all(11)
    got = ours.get_sample(0)

    np.testing.assert_allclose(got["joints"][:, :2],
                               np.asarray(want_meta["joints"])[:, :2], atol=1e-3)
    np.testing.assert_allclose(got["cond_joints"][:, :2],
                               np.asarray(want_meta["cond_joints"])[:, :2], atol=1e-3)
    np.testing.assert_allclose(got["center"], np.asarray(want_meta["center"]),
                               atol=1e-3)
    np.testing.assert_allclose(got["scale"], np.asarray(want_meta["scale"]), atol=1e-5)

    # device-side input build (normalize + colored condition render + concat)
    from buctd_tpu.data.pipeline import collate, make_input_fn, make_target_fn
    batch = collate([got])
    input_fn = make_input_fn(cfg, ours.kpt_colors)
    x = np.asarray(input_fn(batch["image"], batch["cond_joints"]))[0]
    want = np.asarray(want_input).transpose(1, 2, 0)
    assert x.shape == want.shape == (384, 288, 6)
    # RGB: identical up to ~1 uint8 LSB at a handful of interpolation-boundary pixels
    # (float jitter in the affine matrix)
    rgb_err = np.abs(x[..., :3] - want[..., :3])
    assert np.mean(rgb_err < 2e-3) > 0.999 and rgb_err.max() < 0.05
    # condition channels: blurred points; small elementwise tolerance
    np.testing.assert_allclose(x[..., 3:], want[..., 3:], atol=0.75)

    target_fn = make_target_fn(cfg, None)
    tgt, tw = target_fn(batch["joints"], batch["joints_vis"][..., 0])
    np.testing.assert_allclose(np.asarray(tgt)[0].transpose(2, 0, 1),
                               np.asarray(want_target), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tw)[0], np.asarray(want_weight)[:, 0],
                               atol=1e-6)


def _tiny_coco(tmp_path, n_imgs=2, people=2, J=17, seed=0, cond=True):
    import cv2
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    for i in range(n_imgs):
        name = f"im{i}.png"
        cv2.imwrite(str(tmp_path / name), rng.randint(0, 255, (240, 320, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "width": 320, "height": 240})
        for p in range(people):
            x0, y0 = 20 + 140 * p, 30
            kps = []
            pts = np.stack([rng.uniform(x0, x0 + 100, J),
                            rng.uniform(y0, y0 + 160, J)], 1)
            for x, y in pts:
                kps += [float(x), float(y), 2]
            ann = {
                "id": aid, "image_id": i + 1, "category_id": 1, "iscrowd": 0,
                "keypoints": kps, "num_keypoints": J,
                "bbox": [x0, y0, 110, 170], "area": 110 * 170,
            }
            if cond:
                noisy = (pts + rng.uniform(-5, 5, pts.shape)).clip(1, 315)
                flat = []
                for x, y in noisy:
                    flat += [float(x), float(y), 1.0]
                ann["cond_kpts"] = {"petr": flat}
            anns.append(ann)
            aid += 1
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person",
                          "keypoints": ["k"] * J, "skeleton": []}]}
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(gt))
    return str(path), gt


def test_tiny_coco_end_to_end_eval(tmp_path):
    """db build (cond json) -> loader batches -> perfect preds -> AP == 1.0."""
    ann_file, gt = _tiny_coco(tmp_path)
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    assert len(ds.db) == 4
    assert isinstance(ds.db[0]["cond_joints"], dict)

    from buctd_tpu.data.pipeline import Loader
    loader = Loader(ds, cfg, batch_size=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["input"].shape == (3, 384, 288, 6)
    assert batches[1]["valid"].sum() == 1

    # perfect predictions = GT keypoints with confidence 1
    preds, boxes, paths = [], [], []
    for rec, ann in zip(ds.db, gt["annotations"]):
        kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
        kp[:, 2] = 0.9
        preds.append(kp)
        c, s = rec["center"], rec["scale"]
        boxes.append([c[0], c[1], s[0], s[1], np.prod(np.asarray(s) * 200),
                      rec.get("score", 1), ann["id"]])
        paths.append(rec["image"])
    name_value, ap = ds.evaluate(cfg, np.array(preds), str(tmp_path),
                                 np.array(boxes), paths)
    assert ap == pytest.approx(1.0, abs=1e-6), name_value


@pytest.mark.parametrize("name,J", [("multimouse", 12), ("fish", 7),
                                    ("marmosets", 15)])
def test_animal_dataset_end_to_end_eval(tmp_path, name, J):
    """DLC animal datasets: db build -> perfect preds -> AP == 1.0 under the
    flat-0.1 OKS sigma override (reference multimouse.py:97 / fish.py:89 /
    marmosets.py:97)."""
    ann_file, gt = _tiny_coco(tmp_path, J=J)
    cfg = _cfg(["DATASET.DATASET", name, "MODEL.NUM_JOINTS", str(J),
                "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    assert len(ds.db) == 4
    np.testing.assert_array_equal(ds.oks_sigmas, np.full(J, 0.1))

    preds, boxes, paths = [], [], []
    for rec, ann in zip(ds.db, gt["annotations"]):
        kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
        kp[:, 2] = 0.9
        preds.append(kp)
        c, s = rec["center"], rec["scale"]
        boxes.append([c[0], c[1], s[0], s[1], np.prod(np.asarray(s) * 200),
                      rec.get("score", 1), ann["id"]])
        paths.append(rec["image"])
    name_value, ap = ds.evaluate(cfg, np.array(preds), str(tmp_path),
                                 np.array(boxes), paths)
    assert ap == pytest.approx(1.0, abs=1e-6), name_value


def test_device_synthesis_loader(tmp_path):
    """TPU.DEVICE_SYNTHESIS: the loader runs the batched jit sampler and feeds
    plan_sample via cond_override — conditions differ from GT (noise applied)
    but stay in the crop frame, and batches keep their shapes."""
    ann_file, _ = _tiny_coco(tmp_path, cond=False)
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "True", "TRAIN.USE_BU_BBOX", "True",
                "DATASET.TRAIN_IMAGE_DIR", str(tmp_path),
                "DATASET.TRAIN_ANNOTATION_FILE", ann_file,
                "TPU.DEVICE_SYNTHESIS", "True",
                "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]"])
    from buctd_tpu.data import get_dataset
    from buctd_tpu.data.pipeline import Loader
    ds = get_dataset(cfg, is_train=True)
    loader = Loader(ds, cfg, batch_size=4, num_workers=2)
    assert loader.device_synth is not None
    batch = next(iter(loader))
    assert batch["input"].shape == (4, 128, 96, 6)
    # synthesized conditions are crop-frame and mostly differ from GT joints
    d = np.linalg.norm(batch["cond_joints"][..., :2] - batch["joints"][..., :2],
                       axis=-1)
    live = batch["cond_joints_vis"][..., 0] > 0
    assert np.isfinite(batch["cond_joints"]).all()
    assert (d[live] > 0.5).mean() > 0.5, "synthesis produced no noise"
    # a second batch re-folds the key: different draws
    batch2 = next(iter(loader))
    assert not np.allclose(batch2["cond_joints"], batch["cond_joints"])


def test_ochuman_dataset_end_to_end_eval(tmp_path):
    """OCHuman (COCO-17 skeleton, inherited eval path) — the 3x-refinement
    headline dataset (README.md:104)."""
    ann_file, gt = _tiny_coco(tmp_path)
    cfg = _cfg(["DATASET.DATASET", "ochuman",
                "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    assert len(ds.db) == 4 and len(ds.flip_pairs) == 8
    preds, boxes, paths = [], [], []
    for rec, ann in zip(ds.db, gt["annotations"]):
        kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
        kp[:, 2] = 0.9
        preds.append(kp)
        c, s = rec["center"], rec["scale"]
        boxes.append([c[0], c[1], s[0], s[1], np.prod(np.asarray(s) * 200),
                      rec.get("score", 1), ann["id"]])
        paths.append(rec["image"])
    _, ap = ds.evaluate(cfg, np.array(preds), str(tmp_path),
                        np.array(boxes), paths)
    assert ap == pytest.approx(1.0, abs=1e-6)


def test_synthesis_train_db(tmp_path):
    """Training db with generative sampling: cond seeded from GT and synthesized."""
    ann_file, _ = _tiny_coco(tmp_path, cond=False)
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "True", "TRAIN.USE_BU_BBOX", "True",
                "DATASET.TRAIN_IMAGE_DIR", str(tmp_path),
                "DATASET.TRAIN_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=True)
    assert len(ds.db) == 4
    assert len(ds.db[0]["near_joints"]) >= 1
    _seed_all(5)
    s = ds.get_sample(0)
    assert s["image"].shape == (384, 288, 3)
    assert s["cond_joints"].shape == (17, 3)
    assert s["has_cond"] == 1.0
    # synthesized condition differs from GT but stays in the crop vicinity
    live = s["cond_joints"][:, 2] > 0
    assert live.sum() >= 10
    d = np.linalg.norm((s["cond_joints"] - s["joints"])[live, :2], axis=-1)
    assert 0 < np.median(d) < 200


def test_bu_detection_results_db(tmp_path):
    """BU prediction json ({'preds','scores','image_paths'}) -> conditions +
    kpt-derived boxes + cond_max_iou (dataloader.py:325-393)."""
    ann_file, gt = _tiny_coco(tmp_path)
    rng = np.random.RandomState(0)
    preds_json = []
    for img in gt["images"]:
        people = [a for a in gt["annotations"] if a["image_id"] == img["id"]]
        preds, scores = [], []
        for ann in people:
            kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
            kp[:, 2] = 0.8
            preds.append(kp.tolist())
            scores.append(0.9)
        # a low-score detection (filtered by IMAGE_THRE); must be nonzero — the
        # reference derives boxes for every pred before filtering (:381-390)
        preds.append((np.array(preds[0]) + 3.0).tolist())
        scores.append(0.01)
        preds_json.append({"preds": preds, "scores": scores,
                           "image_paths": [str(tmp_path / img["file_name"])]})
    bu_file = tmp_path / "bu.json"
    bu_file.write_text(json.dumps(preds_json))

    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "TEST.COCO_BBOX_FILE", str(bu_file), "TEST.IMAGE_THRE", "0.1",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    assert len(ds.db) == 4  # low-score entries filtered by IMAGE_THRE
    rec = ds.db[0]
    assert rec["cond_joints"].shape == (17, 3)
    assert rec["use_bu_bbox"] and rec["score"] == 0.9
    assert 0 <= rec["cond_max_iou"] <= 1
    s = ds.get_sample(0)
    assert s["image"].shape == (384, 288, 3) and s["has_cond"] == 1.0


def test_detector_pickle_db(tmp_path):
    """Detector-box pickle, no conditions (dataloader.py:396-450)."""
    import pickle
    ann_file, gt = _tiny_coco(tmp_path)
    results = []
    for img in gt["images"]:
        boxes = np.array([[10.0, 10.0, 120.0, 200.0, 0.95],
                          [150.0, 20.0, 300.0, 220.0, 0.05]], np.float32)
        results.append([boxes])
    pkl = tmp_path / "dets.pkl"
    pkl.write_bytes(pickle.dumps(results))

    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "False",
                "TEST.USE_BU_BBOX", "False", "TEST.USE_GT_BBOX", "False",
                "TEST.COCO_BBOX_FILE", str(pkl), "TEST.IMAGE_THRE", "0.1",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    assert len(ds.db) == 2  # one kept box per image
    rec = ds.db[0]
    assert "cond_joints" not in rec
    np.testing.assert_allclose(rec["center"], [10 + 55, 10 + 95], atol=1e-6)
    s = ds.get_sample(0)
    assert s["image"].shape == (384, 288, 3) and s["has_cond"] == 0.0


def test_tiny_crowdpose_end_to_end_eval(tmp_path):
    """CrowdPose family: crowdIndex-binned eval stats, box-area-always, no NMS."""
    import cv2
    rng = np.random.RandomState(0)
    J = 14
    images, anns = [], []
    aid = 1
    for i, ci in enumerate([0.05, 0.5, 0.9]):
        name = f"cp{i}.png"
        cv2.imwrite(str(tmp_path / name), rng.randint(0, 255, (240, 320, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "width": 320, "height": 240,
                       "crowdIndex": ci})
        pts = np.stack([rng.uniform(30, 130, J), rng.uniform(30, 190, J)], 1)
        kps = []
        for x, y in pts:
            kps += [float(x), float(y), 2]
        anns.append({"id": aid, "image_id": i + 1, "category_id": 1, "iscrowd": 0,
                     "keypoints": kps, "num_keypoints": J,
                     "bbox": [20, 20, 120, 180], "area": 120 * 180,
                     "cond_kpts": {"petr": kps}})
        aid += 1
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person",
                          "keypoints": ["k"] * J, "skeleton": []}]}
    ann_file = str(tmp_path / "cp.json")
    (tmp_path / "cp.json").write_text(json.dumps(gt))

    cfg = _cfg(["DATASET.DATASET", "crowdpose", "MODEL.NUM_JOINTS", "14",
                "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset
    ds = get_dataset(cfg, is_train=False)
    assert len(ds.db) == 3

    preds, boxes, paths = [], [], []
    for rec, ann in zip(ds.db, gt["annotations"]):
        kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
        kp[:, 2] = 0.9
        preds.append(kp)
        c, s = rec["center"], rec["scale"]
        boxes.append([c[0], c[1], s[0], s[1], np.prod(np.asarray(s) * 200),
                      1.0, ann["id"]])
        paths.append(rec["image"])
    name_value, ap = ds.evaluate(cfg, np.array(preds), str(tmp_path),
                                 np.array(boxes), paths)
    assert list(name_value.keys()) == ["AP", "Ap .5", "AP .75", "AR", "AR .5",
                                       "AR .75", "AP (E)", "AP (M)", "AP (H)"]
    assert ap == pytest.approx(1.0)
    assert name_value["AP (E)"] == pytest.approx(1.0)
    assert name_value["AP (H)"] == pytest.approx(1.0)
