"""Serving-surface bench: PoseEstimator.predict_batch on a realistic MIXED
bucket stream (VERDICT r3 item 8 — the serving path had CPU tests but no TPU
number).

Streams N images whose sizes and instance counts are drawn from a fixed mix
(surveillance-ish 640x480 frames with few people, crowd-scene 960x720 /
1280x960 frames with many), precompiles the expected buckets, then measures
warm wall-clock through ``predict_batch`` in client-sized chunks.  Reports
images/s, crops/s (sum of instances x refine rounds), per-bucket composition,
and the compile count against the estimator's budget.

Reference surface being outperformed: tools/inference.py:31 (per-image python
loop, torch CPU).

Usage: python tools/bench_serve.py [--images 64] [--refine 1] [--chunk 16]
"""

import argparse
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

CFG = "/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml"

# (height, width, poses) draw table with weights — the bucket mix:
# (512, 640, 4) light frames, (768, 1024, 16) crowds, (1024, 1024, 32) heavy
MIX = [
    ((480, 640), 3, 0.45),
    ((480, 640), 7, 0.15),
    ((720, 960), 13, 0.25),
    ((960, 1280), 28, 0.15),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--refine", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=16,
                    help="client batch size per predict_batch call")
    ap.add_argument("--repeats", type=int, default=3)
    a = ap.parse_args()

    import jax  # noqa: F401

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.serving import IMG_BUCKETS, POSE_BUCKETS, PoseEstimator, _bucket

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=CFG, opts=["TPU.EVAL_DTYPE", "bfloat16"],
        modelDir="", logDir="", dataDir=""))
    J = int(cfg.MODEL.NUM_JOINTS)

    rng = np.random.RandomState(0)
    probs = np.array([w for _, _, w in MIX]) / sum(w for _, _, w in MIX)
    draws = rng.choice(len(MIX), size=a.images, p=probs)
    images, conds, buckets = [], [], {}
    for d in draws:
        (h, w), p, _ = MIX[d]
        images.append((rng.rand(h, w, 3) * 255).astype(np.uint8))
        c = np.concatenate([rng.rand(p, J, 2) * [w, h], np.ones((p, J, 1))],
                           -1).astype(np.float32)
        conds.append(c)
        key = (_bucket(h, IMG_BUCKETS), _bucket(w, IMG_BUCKETS),
               _bucket(p, POSE_BUCKETS))
        buckets[key] = buckets.get(key, 0) + 1
    n_crops = sum(c.shape[0] for c in conds)
    print(f"stream: {a.images} images, {n_crops} instances, bucket mix "
          f"{sorted(buckets.items())}", flush=True)

    # warm the batched programs a tuned deployment would: 4- and 8-image
    # count buckets per shape (a small client chunk scatters mixed buckets
    # into 3-7-image groups — without the 4-bucket they all pad to 8 rows)
    # plus the per-image fallbacks
    pre = [(n, hb, wb, pb) for hb, wb, pb in buckets for n in (4, 8)]
    pre += [(hb, wb, pb) for hb, wb, pb in buckets]
    t0 = time.perf_counter()
    est = PoseEstimator(cfg, refine_iters=a.refine, max_compiles=16,
                        precompile=pre)
    t_compile = time.perf_counter() - t0
    print(f"precompile: {len(pre)} shapes in {t_compile:.1f} s "
          f"({len(est._compiled)}/{est.max_compiles} budget)", flush=True)

    def run_stream(chunk):
        outs = []
        for i in range(0, a.images, chunk):
            outs += est.predict_batch(images[i:i + chunk],
                                      conds[i:i + chunk])
        # host materialization is part of the serving contract
        return float(sum(np.asarray(o)[..., 2].sum() for o in outs))

    # padded host->device bytes per stream pass (the axon relay moves
    # ~40-50 MB/s — on this tunnel the transfer IS the serving bottleneck;
    # a real TPU host moves this over PCIe at ~10+ GB/s)
    mb = sum(hb * wb * 3 * cnt for (hb, wb, _), cnt in buckets.items()) / 1e6
    for chunk in dict.fromkeys((a.chunk, a.images)):   # latency + throughput
        run_stream(chunk)                      # warm (jit-cache hits only)
        t0 = time.perf_counter()
        for _ in range(a.repeats):
            run_stream(chunk)
        dt = (time.perf_counter() - t0) / a.repeats
        print(f"predict_batch stream: {dt * 1e3:8.1f} ms -> "
              f"{a.images / dt:6.1f} images/s, "
              f"{n_crops * a.refine / dt:7.1f} crops/s "
              f"(chunk {chunk}, refine x{a.refine}; ~{mb:.0f} MB/pass "
              f"host->device = ~{mb / 45 * 1e3:.0f} ms at 45 MB/s relay)",
              flush=True)
    print(f"compiled programs: {len(est._compiled)} (budget "
          f"{est.max_compiles}); no surprise compiles = "
          f"{len(est._compiled) <= len(pre)}", flush=True)


if __name__ == "__main__":
    main()
