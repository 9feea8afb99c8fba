"""Empirical-condition data prep (reference: data_preprocessing/match_coco_cond.py).

For each bottom-up model's result json, match its predictions to GT instances by
keypoint-bbox IoU and store the matched pose under ``ann['cond_kpts'][model_key]`` in
the training annotation json.  Invisible GT joints zero out the matched prediction
(reference :95-99).

Usage:
  python data_preprocessing/match_coco_cond.py \\
      --gt annotations/train.json --out annotations/train_cond.json \\
      --results results_ep40.json:cid_40 results_ep41.json:cid_41 ...
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np


def calc_bbox_from_keypoints(kpts) -> list:
    kpts = np.asarray(kpts, np.float64).reshape(-1, 2)
    if len(kpts) == 0:
        return [0, 0, 0, 0]
    x0, y0 = kpts.min(axis=0)
    x1, y1 = kpts.max(axis=0)
    return [x0, y0, x1, y1]


def iou_xyxy(a, b) -> float:
    xi0, yi0 = max(a[0], b[0]), max(a[1], b[1])
    xi1, yi1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, xi1 - xi0) * max(0.0, yi1 - yi0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def match_conditions(gt_annotations: dict, pred_results: list, model_key: str) -> int:
    """Attach best-IoU-matched predictions as ann['cond_kpts'][model_key]."""
    by_image = defaultdict(list)
    for pred in pred_results:
        by_image[(pred["image_id"], pred.get("category_id", 1))].append(
            np.array(pred["keypoints"], np.float64).reshape(-1, 3)[:, :2])

    n_matched = 0
    for ann in gt_annotations["annotations"]:
        gt_k = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
        nonzero = [k for k in gt_k[:, :2].tolist() if any(k)]
        if not nonzero:
            continue
        gt_bbox = calc_bbox_from_keypoints(nonzero)
        preds = by_image.get((ann["image_id"], ann.get("category_id", 1)), [])
        if not preds:
            continue
        ious = [iou_xyxy(gt_bbox, calc_bbox_from_keypoints(p)) for p in preds]
        matched = preds[int(np.argmax(ious))]

        flat = []
        for i, (px, py) in enumerate(matched[:len(gt_k)]):
            v = gt_k[i, 2]
            if v == 0:  # invisible GT joints zero the condition (:95-99)
                px = py = 0.0
            flat.extend([float(px), float(py), float(v)])
        ann.setdefault("cond_kpts", {})[model_key] = flat
        n_matched += 1
    return n_matched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True, help="GT annotation json")
    ap.add_argument("--out", required=True, help="output annotation json")
    ap.add_argument("--results", nargs="+", required=True,
                    help="list of <results.json>:<model_key>")
    args = ap.parse_args()

    with open(args.gt) as f:
        gt = json.load(f)
    for spec in args.results:
        path, _, key = spec.rpartition(":")
        with open(path) as f:
            preds = json.load(f)
        n = match_conditions(gt, preds, key)
        print(f"{key}: matched {n} annotations")
    with open(args.out, "w") as f:
        json.dump(gt, f)
    print(f"saved to: {args.out}")


if __name__ == "__main__":
    main()
