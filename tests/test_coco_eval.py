"""COCOKeypointEval tests on hand-built datasets with analytically known AP."""

import numpy as np
import pytest

from buctd_tpu.data.coco_io import COCOIndex
from buctd_tpu.data.coco_eval import COCOKeypointEval, COCO_AREA_RNGS
from buctd_tpu.ops.nms import COCO_SIGMAS

J = 17


def _pose(cx, cy, spread=20, vis=2):
    rng = np.random.RandomState(int(cx * 7 + cy))
    kpts = np.zeros(J * 3)
    kpts[0::3] = cx + rng.rand(J) * spread
    kpts[1::3] = cy + rng.rand(J) * spread
    kpts[2::3] = vis
    return kpts


def _gt_dataset(poses, area=5000.0, crowd_indices=None):
    images, annotations = [], []
    for img_id, img_poses in enumerate(poses, start=1):
        img = {"id": img_id, "width": 640, "height": 480,
               "file_name": f"{img_id}.jpg"}
        if crowd_indices is not None:
            img["crowdIndex"] = crowd_indices[img_id - 1]
        images.append(img)
        for kpts in img_poses:
            x, y = kpts[0::3], kpts[1::3]
            annotations.append({
                "id": len(annotations) + 1, "image_id": img_id, "category_id": 1,
                "keypoints": kpts.tolist(),
                "num_keypoints": int((kpts[2::3] > 0).sum()),
                "area": area, "iscrowd": 0,
                "bbox": [float(x.min()), float(y.min()),
                         float(x.max() - x.min()), float(y.max() - y.min())],
            })
    return COCOIndex({"images": images, "annotations": annotations,
                      "categories": [{"id": 1, "name": "person"}]})


def _dt(img_id, kpts, score):
    return {"image_id": img_id, "category_id": 1, "keypoints": kpts.tolist(),
            "score": score}


def _run(gt, dts, **kw):
    dt = gt.loadRes(dts)
    ev = COCOKeypointEval(gt, dt, COCO_SIGMAS, **kw)
    ev.evaluate()
    ev.accumulate()
    return ev


def test_perfect_predictions_ap1():
    poses = [[_pose(100, 100), _pose(300, 200)], [_pose(50, 60)]]
    gt = _gt_dataset(poses)
    dts = [_dt(1, poses[0][0], 0.9), _dt(1, poses[0][1], 0.8), _dt(2, poses[1][0], 0.95)]
    ev = _run(gt, dts)
    stats = ev.summarize_coco()
    assert stats[0] == pytest.approx(1.0)
    assert stats[5] == pytest.approx(1.0)  # AR


def test_missing_detection_halves_recall():
    poses = [[_pose(100, 100), _pose(400, 300)]]
    gt = _gt_dataset(poses)
    dts = [_dt(1, poses[0][0], 0.9)]  # only one of two GTs detected
    ev = _run(gt, dts)
    stats = ev.summarize_coco()
    # precision = 1 up to recall 0.5 -> AP ~ 0.5 (51/101 thresholds <= 0.5)
    assert stats[0] == pytest.approx(np.mean(np.linspace(0, 1, 101) <= 0.5), abs=1e-6)
    assert stats[5] == pytest.approx(0.5)


def test_false_positive_reduces_ap():
    poses = [[_pose(100, 100)]]
    gt = _gt_dataset(poses)
    dts = [_dt(1, _pose(400, 300), 0.99),  # fp scored above the tp
           _dt(1, poses[0][0], 0.5)]
    ev = _run(gt, dts)
    ap = ev.summarize_coco()[0]
    assert ap == pytest.approx(np.mean(np.linspace(0, 1, 101) > 0) * 0.5, abs=0.01)


def test_oks_threshold_steps():
    # detection offset so OKS is strictly between 0.5 and 0.95 -> AP = fraction of
    # IoU thresholds below its OKS
    base = _pose(100, 100)
    det = base.copy()
    det[0::3] += 6.0
    gt = _gt_dataset([[base]])
    from buctd_tpu.data.coco_eval import compute_oks
    oks = compute_oks(gt.loadAnns([1]), [{"keypoints": det}], COCO_SIGMAS)[0, 0]
    assert 0.5 < oks < 0.95
    ev = _run(gt, [_dt(1, det, 0.9)])
    ap = ev.summarize_coco()[0]
    expected = np.mean(np.linspace(0.5, 0.95, 10) <= oks)
    assert ap == pytest.approx(expected, abs=1e-6)


def test_area_ranges():
    # small gt (area < 32^2) is ignored in medium/large bins
    poses = [[_pose(100, 100)]]
    gt = _gt_dataset(poses, area=500.0)
    dts = [_dt(1, poses[0][0], 0.9)]
    ev = _run(gt, dts)
    stats = ev.summarize_coco()
    assert stats[0] == pytest.approx(1.0)     # all
    assert stats[3] == -1.0                   # AP (M): no gts
    assert stats[4] == -1.0                   # AP (L)


def test_crowdpose_bins():
    poses = [[_pose(100, 100)], [_pose(100, 100)], [_pose(100, 100)]]
    gt = _gt_dataset(poses, crowd_indices=[0.05, 0.5, 0.9])
    dts = [_dt(1, poses[0][0], 0.9), _dt(2, poses[1][0], 0.9)]  # miss the hard image
    ev = _run(gt, dts, area_rngs={"all": (0, 1e10)},
              crowd_index_bins={"easy": (0, 0.1), "medium": (0.1, 0.8),
                                "hard": (0.8, 1.01)})
    stats = ev.summarize_crowdpose()
    assert stats[6] == pytest.approx(1.0)   # easy
    assert stats[7] == pytest.approx(1.0)   # medium
    assert stats[8] == pytest.approx(0.0)   # hard: gt missed

def test_unannotated_gt_is_ignored():
    # gt with zero visible keypoints must not count toward recall
    vis_pose = _pose(100, 100)
    empty = _pose(300, 300)
    empty[2::3] = 0
    gt = _gt_dataset([[vis_pose, empty]])
    dts = [_dt(1, vis_pose, 0.9)]
    ev = _run(gt, dts)
    assert ev.summarize_coco()[0] == pytest.approx(1.0)


def test_iscrowd_gt_absorbs_multiple_detections():
    """pycocotools exempts crowd GTs from single-match: extra detections over a
    crowd region are ignored, not false positives."""
    J = 17
    kps_a = []
    for k in range(J):
        kps_a += [50.0 + k, 60.0 + k, 2]
    gt = {
        "images": [{"id": 1, "width": 200, "height": 200}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "keypoints": kps_a, "num_keypoints": J,
             "bbox": [40, 50, 40, 40], "area": 1600},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 1,
             "keypoints": [0.0] * (3 * J), "num_keypoints": 0,
             "bbox": [100, 100, 80, 80], "area": 6400},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    coco_gt = COCOIndex(gt)
    # perfect dt for the real person + two dts inside the crowd region
    crowd_kps = []
    for k in range(J):
        crowd_kps += [120.0 + k % 5, 130.0 + k % 7, 1]
    dts = [
        {"image_id": 1, "category_id": 1, "keypoints": kps_a, "score": 0.9},
        {"image_id": 1, "category_id": 1, "keypoints": crowd_kps, "score": 0.8},
        {"image_id": 1, "category_id": 1,
         "keypoints": [v + 2 for v in crowd_kps], "score": 0.7},
    ]
    from buctd_tpu.data.datasets.coco import COCO_OKS_SIGMAS
    ev = COCOKeypointEval(coco_gt, coco_gt.loadRes(dts), COCO_OKS_SIGMAS)
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize_coco()
    # both crowd-region dts must be ignored -> perfect AP on the one real GT
    assert stats[0] == pytest.approx(1.0), stats
