"""Tests: binned analysis, condition matcher, zipreader, debug vis dumps."""

import json
import os
import zipfile

import numpy as np
import pytest

from test_data_pipeline import _tiny_coco


def _perfect_results(gt, conf=0.9):
    out = []
    for ann in gt["annotations"]:
        kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
        kp[:, 2] = conf
        out.append({"image_id": ann["image_id"], "category_id": 1,
                    "keypoints": [float(v) for v in kp.ravel()],
                    "score": conf, "annotation_id": ann["id"]})
    return out


def test_bin_evaluate_perfect_predictions(tmp_path):
    ann_file, gt = _tiny_coco(tmp_path)
    from buctd_tpu.analysis import bin_evaluate, coco_evaluation
    from buctd_tpu.data import COCOIndex

    dts = _perfect_results(gt)
    coco_gt = COCOIndex(ann_file)
    # every instance has 17 kpts and overlaps nobody (two far-apart people)
    info = bin_evaluate(coco_gt, dts, overlap_group=[0], num_kpt_group=[16, 17])
    assert info["num_instances"] == 4
    assert info["AP"] == pytest.approx(1.0)
    # empty bin
    info2 = bin_evaluate(coco_gt, dts, overlap_group=[3, 4], num_kpt_group=[16, 17])
    assert info2["num_instances"] == 0

    stats = coco_evaluation(ann_file, dts)
    assert stats["AP"][0, 3] == pytest.approx(1.0)
    assert stats["num_instances"].sum() == 4


def test_sort_instance_ap_ranks_bad_first(tmp_path):
    ann_file, gt = _tiny_coco(tmp_path)
    from buctd_tpu.analysis import sort_instance_ap
    from buctd_tpu.data import COCOIndex

    dts = _perfect_results(gt)
    dts[0]["keypoints"] = [v + (80 if i % 3 == 0 else 0)
                           for i, v in enumerate(dts[0]["keypoints"])]
    ranked = sort_instance_ap(COCOIndex(ann_file), dts)
    assert len(ranked) == 4
    assert ranked[0][1] == dts[0]["annotation_id"]  # corrupted one is worst
    assert ranked[0][0] < ranked[-1][0]


def test_match_coco_cond(tmp_path):
    ann_file, gt = _tiny_coco(tmp_path, cond=False)
    import sys
    sys.path.insert(0, "/root/repo/data_preprocessing")
    from match_coco_cond import match_conditions

    preds = _perfect_results(gt)
    n = match_conditions(gt, preds, "bu_model_1")
    assert n == 4
    for ann in gt["annotations"]:
        assert "bu_model_1" in ann["cond_kpts"]
        got = np.array(ann["cond_kpts"]["bu_model_1"]).reshape(-1, 3)
        want = np.array(ann["keypoints"]).reshape(-1, 3)
        np.testing.assert_allclose(got[:, :2], want[:, :2])


def test_zipreader(tmp_path):
    import cv2
    img = np.random.RandomState(0).randint(0, 255, (32, 48, 3), np.uint8)
    png = tmp_path / "x.png"
    cv2.imwrite(str(png), img)
    zpath = tmp_path / "arch.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(png, "sub/x.png")
    from buctd_tpu.utils import zipreader
    got = zipreader.imread(f"{zpath}@/sub/x.png")
    np.testing.assert_array_equal(got, img)


def test_save_debug_images(tmp_path):
    from buctd_tpu.utils.vis import save_debug_images

    class Flags:
        DEBUG = True
        SAVE_BATCH_IMAGES_GT = True
        SAVE_BATCH_IMAGES_PRED = True
        SAVE_HEATMAPS_GT = True
        SAVE_HEATMAPS_PRED = True

    class Cfg:
        DEBUG = Flags()

    B, H, W, J, h, w = 2, 64, 48, 17, 16, 12
    rng = np.random.RandomState(0)
    inp = rng.randn(B, H, W, 6).astype(np.float32)
    meta = {"joints": rng.rand(B, J, 3) * 40,
            "joints_vis": np.ones((B, J, 3))}
    target = rng.rand(B, h, w, J).astype(np.float32)
    pred = rng.rand(B, J, 2) * 40
    save_debug_images(Cfg(), inp, meta, target, pred, target,
                      str(tmp_path / "dbg"))
    for suffix in ("_gt.jpg", "_pred.jpg", "_hm_gt.jpg", "_hm_pred.jpg"):
        assert (tmp_path / f"dbg{suffix}").exists()


def test_match_gt_to_dt_via_gtmatches(tmp_path):
    """COCOeval-gtMatches pairing (reference qualitative_evaluation.py:71-88):
    works on results jsons with NO annotation_id; undetected GTs map to None."""
    ann_file, gt = _tiny_coco(tmp_path)
    from buctd_tpu.analysis.qualitative_evaluation import match_gt_to_dt
    from buctd_tpu.data import COCOIndex

    dts = _perfect_results(gt)
    dropped = dts.pop(2)           # GT id 3 goes undetected
    for d in dts:
        del d["annotation_id"]     # third-party json: no extension field
    matched = match_gt_to_dt(COCOIndex(ann_file), dts)
    assert set(matched) == {a["id"] for a in gt["annotations"]}
    assert matched[dropped["annotation_id"]] is None
    for ann in gt["annotations"]:
        if ann["id"] == dropped["annotation_id"]:
            continue
        dt = matched[ann["id"]]
        assert dt is not None and dt["image_id"] == ann["image_id"]
        np.testing.assert_allclose(
            np.asarray(dt["keypoints"]).reshape(-1, 3)[:, :2],
            np.asarray(ann["keypoints"]).reshape(-1, 3)[:, :2])


def test_binwise_qualitative_third_party_json(tmp_path):
    """binwise_coco_evaluation on a dt json without annotation_id: gtMatches
    pairing kicks in, unmatched GTs render with an empty prediction panel."""
    ann_file, gt = _tiny_coco(tmp_path)
    from buctd_tpu.analysis.qualitative_evaluation import binwise_coco_evaluation

    dts = _perfect_results(gt)
    dts.pop(1)                     # one undetected GT -> oks 0.0, still dumped
    for d in dts:
        del d["annotation_id"]
    dt_file = tmp_path / "dt_plain.json"
    dt_file.write_text(json.dumps(dts))
    out_dir = tmp_path / "quali"
    binwise_coco_evaluation(ann_file, str(dt_file), str(tmp_path), str(out_dir))
    # two non-overlapping 17-kpt people per image -> bin (overlap[0], kpts 16-17)
    dumps = sorted((out_dir / "overlap0_kpts3").glob("*.jpg"))
    assert len(dumps) == 4
    # worst rank = the undetected GT at oks 0.000
    assert dumps[0].name.startswith("rank000_oks0.000")


def test_save_iou_bin_pred_dumps(tmp_path):
    """Per-IoU-bin pred dumps (reference vis.py:206-266) land in the right
    crowding-bin subdirectories."""
    from buctd_tpu.utils.vis import save_batch_pred_gt_with_joints

    B, H, W, J = 4, 64, 48, 17
    rng = np.random.RandomState(0)
    inp = rng.randn(B, H, W, 6).astype(np.float32)
    joints = rng.rand(B, J, 2) * 40
    vis = np.ones((B, J, 3))
    meta = {"joints": rng.rand(B, J, 3) * 40,
            "cond_joints": rng.rand(B, J, 3) * 40 + 1,
            "cond_max_iou": np.array([0.0, 0.05, 0.4, 0.9]),
            "image": [f"dir/im{k}.jpg" for k in range(B)]}
    out = tmp_path / "bins"
    save_batch_pred_gt_with_joints(inp, joints, vis, meta, str(out))
    for bin_name, fname in [("0", "dir_im0.jpg"), ("0-0.1", "dir_im1.jpg"),
                            ("0.3-0.5", "dir_im2.jpg"), ("0.5-1", "dir_im3.jpg")]:
        assert (out / bin_name / fname).exists(), (bin_name, fname)


def test_vis_coco_keypoints():
    from buctd_tpu.utils.vis_coco import coco_vis_keypoints, COCO_KP_CONNECTIONS
    assert len(COCO_KP_CONNECTIONS) == 15
    img = np.zeros((64, 64, 3), np.uint8)
    kps = np.stack([np.random.RandomState(0).uniform(5, 60, 17),
                    np.random.RandomState(1).uniform(5, 60, 17),
                    np.full(17, 2.0)], 1)
    out = coco_vis_keypoints(img, kps)
    assert out.shape == img.shape and out.sum() > 0


def test_model_extras_defaults():
    from buctd_tpu.config.models import MODEL_EXTRAS
    assert MODEL_EXTRAS["pose_resnet"].NUM_DECONV_LAYERS == 3
    assert MODEL_EXTRAS["pose_hrnet"].STAGE4.NUM_CHANNELS == [32, 64, 128, 256]
    assert MODEL_EXTRAS["pose_hrnet_w48"].STAGE4.NUM_CHANNELS == [48, 96, 192, 384]


def test_analysis_cli(tmp_path):
    import subprocess, sys, os
    ann_file, gt = _tiny_coco(tmp_path)
    dt_file = tmp_path / "dt.json"
    dt_file.write_text(json.dumps(_perfect_results(gt)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, BUCTD_FORCE_CPU="1")
    r = subprocess.run([sys.executable, os.path.join(repo, "tools/analysis.py"),
                        "binned", "--gt", ann_file, "--dt", str(dt_file)],
                       capture_output=True, text=True, env=env,
                       cwd=os.path.join(repo, "tools"), timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout[r.stdout.index("{"):])
    assert stats["AP"][0][3] == 1.0
    r2 = subprocess.run([sys.executable, os.path.join(repo, "tools/analysis.py"),
                         "rank", "--gt", ann_file, "--dt", str(dt_file)],
                        capture_output=True, text=True, env=env,
                        cwd=os.path.join(repo, "tools"), timeout=300)
    assert r2.returncode == 0 and "OKS" in r2.stdout
