"""Batch serving CLI over buctd_tpu.serving.PoseEstimator.

Reads a JSON manifest of images + condition poses, runs the conditional
top-down model (optionally with in-process iterative refinement), and writes
predictions as JSON.  Same-bucket images are batched into single programs
(PoseEstimator.predict_batch); compile shapes are bounded by the estimator's
compile budget.

Manifest format (list of entries):
    [{"image": "path/to/img.jpg",
      "poses": [[[x, y, score], ... J entries], ...P poses]}, ...]
`poses` may also be given with 2 columns (score assumed 1).  Output mirrors the
manifest with a "predictions" field per entry ((P, J, 3) [x, y, conf] lists;
entries below --vis-thres are null).

Usage:
    python tools/serve.py --cfg experiments/coco/buctd/coam_w48_384x288.yaml \
        --checkpoint model.pth --manifest requests.json --out results.json \
        [--refine-iters 3] [--vis-thres 0.3] [--max-compiles 12] \
        [--precompile 512,512,8 ...] [KEY VALUE ...]
"""

import argparse
import json
import time

import numpy as np

import _init_paths  # noqa: F401


def parse_args():
    p = argparse.ArgumentParser(description="BUCTD batch serving")
    p.add_argument("--cfg", default=None)
    p.add_argument("--exported", default=None,
                   help="serve from a tools/export.py artifact directory "
                        "instead of --cfg/--checkpoint (no model code, no "
                        "re-tracing)")
    p.add_argument("--checkpoint", default=None,
                   help=".pth (converted in-process) or orbax dir")
    p.add_argument("--manifest", required=True,
                   help="JSON list of {image, poses} entries")
    p.add_argument("--out", required=True, help="output JSON path")
    p.add_argument("--refine-iters", type=int, default=1)
    p.add_argument("--vis-thres", type=float, default=0.0)
    p.add_argument("--max-compiles", type=int, default=12)
    p.add_argument("--precompile", action="append", default=[],
                   help="h,w,p (or n,h,w,p batched) bucket to warm at "
                        "startup (repeatable)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batched serving over all local devices "
                        "(jax.sharding.Mesh; params replicated, image rows "
                        "data-sharded)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    import types

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.serving import PoseEstimator

    with open(args.manifest) as f:
        entries = json.load(f)

    if args.exported:
        from buctd_tpu.serving_export import ExportedPoseEstimator
        est = ExportedPoseEstimator(args.exported)
        print(f"# serving from exported artifact {args.exported} "
              f"({est.manifest['model_name']}, "
              f"{len(est.manifest['programs'])} programs)")
    else:
        if not args.cfg:
            raise SystemExit("one of --cfg or --exported is required")
        cfg = default_config()
        update_config(cfg, types.SimpleNamespace(
            cfg=args.cfg, opts=args.opts, modelDir="", logDir="", dataDir=""))

        precompile = [tuple(int(v) for v in s.split(","))
                      for s in args.precompile]
        mesh = None
        if args.data_parallel:
            import jax

            from buctd_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
            print(f"# data-parallel serving over {mesh.size} devices "
                  f"({jax.devices()[0].platform})")
        est = PoseEstimator(cfg, checkpoint=args.checkpoint,
                            refine_iters=args.refine_iters,
                            max_compiles=args.max_compiles,
                            precompile=precompile, mesh=mesh)

    import cv2
    images, conditions, keep = [], [], []
    for i, e in enumerate(entries):
        img = cv2.imread(e["image"], cv2.IMREAD_COLOR)
        if img is None:
            print(f"# skipping unreadable image: {e['image']}")
            continue
        images.append(img[:, :, ::-1])  # BGR -> RGB
        conditions.append(np.asarray(e["poses"], np.float32))
        keep.append(i)

    t0 = time.perf_counter()
    preds = est.predict_batch(images, conditions, vis_thres=args.vis_thres)
    dt = time.perf_counter() - t0
    n_poses = sum(len(c) for c in conditions)
    print(f"# served {len(images)} images / {n_poses} poses in {dt:.2f}s "
          f"({n_poses / max(dt, 1e-9):.1f} poses/s)")

    for i, p in zip(keep, preds):
        # float64: np.float64 subclasses Python float, so json serializes the
        # object array's leaves; float32 leaves would raise
        p = np.asarray(p, np.float64)
        entries[i]["predictions"] = np.where(np.isfinite(p), p, None).tolist()
    with open(args.out, "w") as f:
        json.dump(entries, f)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
