"""Epoch-level train throughput: does the input pipeline overlap the step?

VERDICT r2 weak-point: the per-step benches (tools/bench_train.py) time the
compute alone; on this ONE-core host the risk is that host-side sample prep
starves the TPU.  This bench builds a synthetic on-disk COCO-style dataset,
runs ONE real epoch through the actual Loader/DeviceLoader + jitted train step
(the tools/train.py hot loop), and reports end-to-end crops/s next to the
pure-step crops/s — the gap is the un-overlapped input cost.

    python tools/bench_epoch.py [--samples 256] [--batch 64] [--device-pipeline]
                                [--device-synthesis]
"""

import argparse
import json
import os
import sys
import tempfile
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()


def make_synth_coco(root, n_imgs, people, hw=(480, 640), seed=0):
    """COCO-style annotation json + images on disk (mirrors the tests' tiny-coco
    generator at realistic image sizes)."""
    import cv2

    rng = np.random.RandomState(seed)
    H, W = hw
    images, anns = [], []
    aid = 1
    J = 17
    for i in range(n_imgs):
        name = f"im{i}.jpg"
        cv2.imwrite(os.path.join(root, name),
                    rng.randint(0, 255, (H, W, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "width": W, "height": H})
        for p in range(people):
            x0 = 20 + (W - 160) * p // max(people, 1)
            y0 = 30
            pts = np.stack([rng.uniform(x0, x0 + 120, J),
                            rng.uniform(y0, y0 + 300, J)], 1)
            kps = []
            for x, y in pts:
                kps += [float(x), float(y), 2]
            ann = {"id": aid, "image_id": i + 1, "category_id": 1, "iscrowd": 0,
                   "keypoints": kps, "num_keypoints": J,
                   "bbox": [x0, y0, 130, 320], "area": 130 * 320}
            noisy = (pts + rng.uniform(-6, 6, pts.shape)).clip(1, W - 2)
            flat = []
            for x, y in noisy:
                flat += [float(x), float(y), 1.0]
            ann["cond_kpts"] = {"petr": flat}
            anns.append(ann)
            aid += 1
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person", "keypoints": ["k"] * J,
                          "skeleton": []}]}
    path = os.path.join(root, "ann.json")
    with open(path, "w") as f:
        json.dump(gt, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--people", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--device-pipeline", action="store_true")
    ap.add_argument("--device-synthesis", action="store_true")
    ap.add_argument("--prefetch", type=int, default=None,
                    help="override TPU.PREFETCH (0 = synchronous loop)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.data import Loader, get_dataset
    from buctd_tpu.models import get_model
    from buctd_tpu.train.state import create_train_state, make_train_step

    root = tempfile.mkdtemp(prefix="buctd_epoch_bench_")
    n_imgs = -(-a.samples // a.people)
    ann = make_synth_coco(root, n_imgs, a.people)
    print(f"synthetic dataset: {n_imgs} images x {a.people} people at {root}",
          flush=True)

    opts = ["DATASET.TRAIN_IMAGE_DIR", root, "DATASET.TRAIN_ANNOTATION_FILE", ann,
            "DATASET.SYNTHESIS_POSE", "True", "TRAIN.USE_BU_BBOX", "True",
            "WORKERS", str(a.workers)]
    if a.device_pipeline:
        opts += ["TPU.DEVICE_PIPELINE", "True"]
    if a.device_synthesis:
        opts += ["TPU.DEVICE_SYNTHESIS", "True"]
    if a.prefetch is not None:
        opts += ["TPU.PREFETCH", str(a.prefetch)]
    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml",
        opts=opts, modelDir="", logDir="", dataDir=""))

    ds = get_dataset(cfg, is_train=True)
    if a.device_pipeline:
        from buctd_tpu.data.device_pipeline import DeviceLoader
        loader = DeviceLoader(ds, cfg, batch_size=a.batch, shuffle=True,
                              num_workers=a.workers)
    else:
        loader = Loader(ds, cfg, batch_size=a.batch, shuffle=True,
                        num_workers=a.workers)

    model = get_model(cfg, is_train=True, dtype=jnp.bfloat16)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 384, 288, 6)), steps_per_epoch=100)
    step = make_train_step(cfg, model)
    d_rng = jax.random.PRNGKey(1)

    # warm epoch 0 (compiles: step + per-bucket preprocessing programs)
    t0 = time.perf_counter()
    n = 0
    loss = None
    for batch in loader:
        dev = {k: batch[k] for k in ("input", "target", "target_weight")}
        state, metrics = step(state, dev, d_rng)
        n += batch["input"].shape[0]
        loss = metrics["loss"]
    print(f"warm epoch: {time.perf_counter() - t0:.1f}s over {n} crops "
          f"(incl. compiles), loss={float(loss):.5f}", flush=True)

    # timed epoch — through the same background staging as train_epoch
    from buctd_tpu.utils.prefetch import prefetch

    def stage(batch):
        return batch, {k: batch[k] for k in ("input", "target", "target_weight")}

    depth = int(getattr(cfg.TPU, "PREFETCH", 2))
    t0 = time.perf_counter()
    n = 0
    for batch, dev in prefetch(loader, stage, depth):
        state, metrics = step(state, dev, d_rng)
        n += batch["input"].shape[0]
    _ = float(metrics["loss"])       # fence the tail
    dt = time.perf_counter() - t0
    epoch_cps = n / dt

    # pure-step throughput on the LAST batch (input pipeline excluded)
    def run(k, state):
        acc = None
        for _ in range(k):
            state, metrics = step(state, dev, d_rng)
            acc = metrics["loss"] if acc is None else acc + metrics["loss"]
        return float(acc), state

    _, state = run(2, state)
    t0 = time.perf_counter()
    _, state = run(5, state)
    sdt = (time.perf_counter() - t0) / 5
    step_cps = a.batch / sdt

    print(json.dumps({
        "mode": ("device_pipeline" if a.device_pipeline else "host_loader")
                + ("+device_synthesis" if a.device_synthesis else ""),
        "batch": a.batch, "samples": n,
        "epoch_crops_per_sec": round(epoch_cps, 1),
        "step_crops_per_sec": round(step_cps, 1),
        "input_overhead_pct": round((step_cps / epoch_cps - 1) * 100, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
