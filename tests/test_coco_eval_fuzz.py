"""Randomized fuzz + differential tests for the from-scratch COCOKeypointEval.

COCOKeypointEval (data/coco_eval.py) is the oracle behind every AP claim, and
pycocotools itself is not installed here, so the class is hardened two ways
(VERDICT r4 item 4):

  * internal invariants on random datasets — precision/recall bounds, monotone
    (smoothed) PR curves, detection-order invariance, score-monotone-transform
    invariance, junk-FP monotonicity, crowd/ignore absorption;
  * a DIFFERENTIAL oracle: an independent straight-line reimplementation of
    pycocotools' single-threshold matching + the "max precision at recall >= r"
    form of 101-point interpolated AP (mathematically equal to, but coded
    unlike, the class's right-to-left smoothing + searchsorted accumulate, so
    an off-by-one in either implementation breaks the comparison).

Semantics under test are pycocotools COCOeval keypoints per
/root/reference/lib/dataset/dataloader.py:719-735.
"""

import numpy as np
import pytest

from buctd_tpu.data.coco_eval import COCOKeypointEval, compute_oks
from buctd_tpu.data.coco_io import COCOIndex
from buctd_tpu.ops.nms import COCO_SIGMAS

J = 17
AREA_ALL = {"all": (0.0, 1e10)}


# ---------------------------------------------------------------------------
# random data
# ---------------------------------------------------------------------------

def _random_gt(rng, n_images=4, crowd_prob=0.1, empty_prob=0.1):
    images, anns = [], []
    for img_id in range(1, n_images + 1):
        images.append({"id": img_id, "width": 640, "height": 480,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(rng.randint(0, 5)):
            cx, cy = rng.rand(2) * 400 + 100
            kpts = np.zeros(J * 3)
            kpts[0::3] = cx + rng.randn(J) * 15
            kpts[1::3] = cy + rng.randn(J) * 15
            vis = (rng.rand(J) < 0.8) * 2.0
            if rng.rand() < empty_prob:
                vis[:] = 0.0           # unannotated instance -> _ignore
            kpts[2::3] = vis
            x, y = kpts[0::3], kpts[1::3]
            anns.append({
                "id": len(anns) + 1, "image_id": img_id, "category_id": 1,
                "keypoints": kpts.tolist(),
                "num_keypoints": int((vis > 0).sum()),
                "area": float(rng.rand() * 8000 + 500),
                "iscrowd": int(rng.rand() < crowd_prob),
                "bbox": [float(x.min()), float(y.min()),
                         float(x.max() - x.min()), float(y.max() - y.min())],
            })
    return COCOIndex({"images": images, "annotations": anns,
                      "categories": [{"id": 1, "name": "person"}]})


def _random_dts(rng, gt, detect_prob=0.8, fp_per_image=2, tie_scores=True):
    """Noisy copies of (most) GTs + far-off false positives; quantized scores
    produce ties so the mergesort stability rule is actually exercised."""
    dts = []

    def score():
        s = float(rng.rand())
        return round(s, 1) if tie_scores else s

    for ann in gt.dataset["annotations"]:
        if rng.rand() > detect_prob:
            continue
        k = np.asarray(ann["keypoints"], float).copy()
        k[0::3] += rng.randn(J) * rng.choice([1.0, 5.0, 25.0])
        k[1::3] += rng.randn(J) * rng.choice([1.0, 5.0, 25.0])
        k[2::3] = rng.rand(J)
        dts.append({"image_id": ann["image_id"], "category_id": 1,
                    "keypoints": k.tolist(), "score": score()})
    for img_id in gt.getImgIds():
        for _ in range(rng.randint(0, fp_per_image + 1)):
            k = np.zeros(J * 3)
            k[0::3] = rng.rand(J) * 30 + 580   # far corner: pure junk
            k[1::3] = rng.rand(J) * 30 + 440
            k[2::3] = rng.rand(J)
            dts.append({"image_id": img_id, "category_id": 1,
                        "keypoints": k.tolist(), "score": score()})
    return dts


def _stats(gt, dts, iou_thrs=None, area_rngs=None):
    """Default COCO area ranges; the differential test restricts to 'all'
    (the oracle doesn't model area-ignore, which hand tests cover)."""
    ev = COCOKeypointEval(gt, gt.loadRes(dts), COCO_SIGMAS,
                          area_rngs=area_rngs, iou_thrs=iou_thrs)
    ev.evaluate()
    ev.accumulate()
    return ev


# ---------------------------------------------------------------------------
# the independent single-threshold oracle
# ---------------------------------------------------------------------------

def _oracle_ap_ar(gt, dt_list, thr, max_dets=20):
    """Straight-line pycocotools-keypoints semantics at ONE IoU threshold,
    area range 'all': greedy matching (crowd GTs absorb extra dts, ignored GTs
    only matched after real ones fail), stable score pooling, AP as
    'max precision among points with recall >= r' over the 101 thresholds."""
    records = []          # (score, is_tp, is_ignored) in pooled stable order
    npig = 0
    for img_id in sorted(gt.getImgIds()):
        gts = list(gt.imgToAnns[img_id])
        dts = [d for d in dt_list if d["image_id"] == img_id]
        dts = sorted(dts, key=lambda d: -d["score"])[:max_dets]
        ig = [1 if (g.get("iscrowd", 0)
                    or np.count_nonzero(np.asarray(g["keypoints"][2::3]) > 0) == 0)
              else 0 for g in gts]
        order = np.argsort(ig, kind="mergesort")
        gts = [gts[i] for i in order]
        ig = [ig[i] for i in order]
        npig += ig.count(0)
        ious = compute_oks(gts, dts, np.asarray(COCO_SIGMAS))
        taken = [False] * len(gts)
        for di, dt in enumerate(dts):
            best, best_iou = -1, min(thr, 1 - 1e-10)
            for gi, g in enumerate(gts):
                if taken[gi] and not g.get("iscrowd", 0):
                    continue
                if best > -1 and ig[best] == 0 and ig[gi] == 1:
                    break
                if ious[di, gi] >= best_iou:
                    best_iou, best = ious[di, gi], gi
            if best == -1:
                records.append((dt["score"], False, False))
            else:
                taken[best] = True
                records.append((dt["score"], ig[best] == 0, ig[best] == 1))
    if npig == 0:
        return -1.0, -1.0
    order = np.argsort(-np.asarray([r[0] for r in records]), kind="mergesort")
    tp = fp = 0
    rc, pr = [], []
    for i in order:
        _, is_tp, is_ig = records[i]
        if is_ig:
            continue
        tp += is_tp
        fp += not is_tp
        rc.append(tp / npig)
        pr.append(tp / (tp + fp + np.spacing(1)))
    ap = float(np.mean([max([p for p, c in zip(pr, rc) if c >= r], default=0.0)
                        for r in np.linspace(0.0, 1.0, 101)]))
    ar = rc[-1] if rc else 0.0
    return ap, ar


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(12))
def test_fuzz_differential_vs_oracle(seed):
    rng = np.random.RandomState(seed)
    gt = _random_gt(rng)
    dts = _random_dts(rng, gt)
    if not dts:
        return
    for thr in (0.5, 0.75, 0.95):
        ev = _stats(gt, dts, iou_thrs=[thr])
        ap, ar = ev._ap("all"), ev._ar("all")
        o_ap, o_ar = _oracle_ap_ar(gt, dts, thr)
        assert ap == pytest.approx(o_ap, abs=1e-9), f"seed={seed} thr={thr}"
        assert ar == pytest.approx(o_ar, abs=1e-9), f"seed={seed} thr={thr}"


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_bounds_and_monotone_pr(seed):
    rng = np.random.RandomState(100 + seed)
    gt = _random_gt(rng)
    dts = _random_dts(rng, gt)
    if not dts:
        return
    ev = _stats(gt, dts)
    p = ev.precision["all"]
    r = ev.recall["all"]
    valid = p[p > -1]
    assert ((valid >= 0) & (valid <= 1)).all()
    assert ((r[r > -1] >= 0) & (r[r > -1] <= 1)).all()
    # interpolated precision is non-increasing in the recall threshold
    for t in range(p.shape[0]):
        row = p[t]
        if (row > -1).all():
            assert (np.diff(row) <= 1e-12).all()
    ap = ev._ap("all")
    assert ap == -1.0 or 0.0 <= ap <= 1.0


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_dt_order_and_score_transform_invariance(seed):
    rng = np.random.RandomState(200 + seed)
    gt = _random_gt(rng)
    dts = _random_dts(rng, gt, tie_scores=False)   # distinct scores
    if not dts:
        return
    base = _stats(gt, dts).summarize_coco()

    shuffled = list(dts)
    rng.shuffle(shuffled)
    assert _stats(gt, shuffled).summarize_coco() == pytest.approx(base)

    # order-preserving score transform: identical matching and PR curve
    rescored = [dict(d, score=0.5 * d["score"] + 0.25) for d in dts]
    assert _stats(gt, rescored).summarize_coco() == pytest.approx(base)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_junk_fp_never_increases_ap(seed):
    rng = np.random.RandomState(300 + seed)
    gt = _random_gt(rng, crowd_prob=0.0)
    dts = _random_dts(rng, gt, fp_per_image=0)
    if not dts:
        return
    base = _stats(gt, dts)._ap("all")
    junk = np.zeros(J * 3)
    junk[0::3] = 600 + rng.rand(J) * 10   # overlaps nothing
    junk[1::3] = 460 + rng.rand(J) * 10
    for score in (0.05, 0.5, 0.99):
        ap = _stats(gt, dts + [{"image_id": 1, "category_id": 1,
                                "keypoints": junk.tolist(),
                                "score": score}])._ap("all")
        assert ap <= base + 1e-9


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_crowd_and_ignore_absorption(seed):
    """Adding crowd GT regions + detections inside them must not change the
    stats: the crowd dts are absorbed (ignored), not counted as FPs, and the
    crowd GTs don't count toward recall.  Same for zero-visible-kpt GTs."""
    rng = np.random.RandomState(400 + seed)
    gt = _random_gt(rng, crowd_prob=0.0, empty_prob=0.0)
    dts = _random_dts(rng, gt, fp_per_image=1)
    if not dts:
        return
    base = _stats(gt, dts).summarize_coco()

    data = {k: list(v) if isinstance(v, list) else v
            for k, v in gt.dataset.items()}
    data["annotations"] = [dict(a) for a in data["annotations"]]
    extra_dts = list(dts)
    next_id = len(data["annotations"]) + 1
    for img_id in (1, 2):
        # tiny far-corner crowd region: the k1=0 OKS form extends the box to
        # [x-w, x+2w] and normalizes by the crowd AREA, so a big/near box
        # would legitimately absorb noisy real detections (that's pycocotools
        # behavior, not a bug) and CHANGE AP — keep it small and remote so
        # only our planted crowd dts can overlap it
        data["annotations"].append({
            "id": next_id, "image_id": img_id, "category_id": 1,
            "keypoints": [0.0] * (J * 3), "num_keypoints": 0,
            "area": 100.0, "iscrowd": 1, "bbox": [600.0, 20.0, 10.0, 10.0]})
        next_id += 1
        for k in range(2):     # several dts inside the crowd box
            kk = np.zeros(J * 3)
            kk[0::3] = 600 + rng.rand(J) * 10 + k * 0.5
            kk[1::3] = 20 + rng.rand(J) * 10
            kk[2::3] = 1.0
            extra_dts.append({"image_id": img_id, "category_id": 1,
                              "keypoints": kk.tolist(),
                              "score": round(float(rng.rand()), 1)})
    gt2 = COCOIndex(data)
    assert _stats(gt2, extra_dts).summarize_coco() == pytest.approx(base)


def test_tie_breaking_is_mergesort_stable():
    """Equal-score detections pool in image order (pycocotools argsort
    '-score' with kind='mergesort'): an img-1 FP and an img-2 TP at the same
    score must yield precision 0.5 on the TP point, AP = 0.5 * 51/101."""
    poses = []
    for cx in (100.0, 300.0):
        k = np.zeros(J * 3)
        k[0::3] = cx + np.linspace(0, 20, J)
        k[1::3] = 100 + np.linspace(0, 20, J)
        k[2::3] = 2
        poses.append(k)
    gt = COCOIndex({
        "images": [{"id": i, "width": 640, "height": 480,
                    "file_name": f"{i}.jpg"} for i in (1, 2)],
        "annotations": [
            {"id": i + 1, "image_id": i + 1, "category_id": 1,
             "keypoints": p.tolist(), "num_keypoints": J, "area": 4000.0,
             "iscrowd": 0,
             "bbox": [float(p[0::3].min()), float(p[1::3].min()), 20.0, 20.0]}
            for i, p in enumerate(poses)],
        "categories": [{"id": 1, "name": "person"}]})
    junk = np.zeros(J * 3)
    junk[0::3] = 600.0
    junk[1::3] = 460.0
    dts = [
        {"image_id": 1, "category_id": 1, "keypoints": junk.tolist(),
         "score": 0.7},                                    # FP, pooled FIRST
        {"image_id": 2, "category_id": 1, "keypoints": poses[1].tolist(),
         "score": 0.7},                                    # TP, same score
    ]
    ap = _stats(gt, dts)._ap("all")
    # only the GT on image 2 is detected; GT on image 1 is missed
    assert ap == pytest.approx(0.5 * np.mean(np.linspace(0, 1, 101) <= 0.5))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_crowd_index_bins_match_restricted_eval(seed):
    """crowdIndex-binned AP (the crowdposetools extension, reference
    crowdpose.py:121-243) must equal a FRESH eval over only that bin's
    images: matching is per-image, so subset accumulation over pooled
    eval-images and evaluation of the restricted dataset are the same
    computation arrived at differently."""
    rng = np.random.RandomState(500 + seed)
    gt = _random_gt(rng)
    data = gt.dataset
    bins = {"easy": (0.0, 0.1), "medium": (0.1, 0.8), "hard": (0.8, 1.01)}
    for img in data["images"]:
        img["crowdIndex"] = float(rng.rand())
    gt = COCOIndex(data)
    dts = _random_dts(rng, gt)
    if not dts:
        return
    ev = COCOKeypointEval(gt, gt.loadRes(dts), COCO_SIGMAS,
                          area_rngs=AREA_ALL, crowd_index_bins=bins)
    ev.evaluate()
    ev.accumulate()
    for name, (lo, hi) in bins.items():
        keep = {i["id"] for i in data["images"]
                if lo <= i["crowdIndex"] < hi}
        sub = {"images": [i for i in data["images"] if i["id"] in keep],
               "annotations": [a for a in data["annotations"]
                               if a["image_id"] in keep],
               "categories": data["categories"]}
        sub_dts = [d for d in dts if d["image_id"] in keep]
        if not sub["images"]:
            assert ev._ap(name) == -1.0
            continue
        if not sub_dts:     # loadRes needs a non-empty list; nothing to diff
            continue
        sub_gt = COCOIndex(sub)
        sub_ev = COCOKeypointEval(sub_gt, sub_gt.loadRes(sub_dts),
                                  COCO_SIGMAS, area_rngs=AREA_ALL)
        sub_ev.evaluate()
        sub_ev.accumulate()
        assert ev._ap(name) == pytest.approx(sub_ev._ap("all"), abs=1e-12), \
            (seed, name)
        assert ev._ar(name) == pytest.approx(sub_ev._ar("all"), abs=1e-12), \
            (seed, name)


def test_gt_matches_pairs_every_gt():
    """gt_matches (the qualitative-analysis hook) maps every GT id; perfect
    detections match each GT to its own dt, junk stays unmatched (0)."""
    rng = np.random.RandomState(9)
    gt = _random_gt(rng, crowd_prob=0.0, empty_prob=0.0)
    dts = [{"image_id": a["image_id"], "category_id": 1,
            "keypoints": list(a["keypoints"]), "score": 0.9}
           for a in gt.dataset["annotations"]]
    coco_dt = gt.loadRes(dts)
    ev = COCOKeypointEval(gt, coco_dt, COCO_SIGMAS, area_rngs=AREA_ALL)
    ev.evaluate()
    matches = ev.gt_matches(iou_index=0)
    assert set(matches) == {a["id"] for a in gt.dataset["annotations"]}
    for gt_id, dt_id in matches.items():
        assert dt_id != 0
        assert (coco_dt.anns[dt_id]["keypoints"]
                == gt.anns[gt_id]["keypoints"])
        assert coco_dt.anns[dt_id]["image_id"] == gt.anns[gt_id]["image_id"]
