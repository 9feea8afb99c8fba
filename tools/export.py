"""Export the serving pipeline as a standalone StableHLO artifact.

Serializes the bucketed crop->render->forward->decode(->refine) programs plus
the weights into a directory that ``buctd_tpu.serving_export
.ExportedPoseEstimator`` (or ``tools/serve.py --exported DIR``) can serve from
WITHOUT model/config code or re-tracing — the deployment story the reference
repo lacks (its serving is tools/inference.py with the full repo on the path;
closest torch analog: TorchScript export).

Usage:
    python tools/export.py --cfg experiments/coco/buctd/coam_w48_384x288.yaml \
        --checkpoint model.pth --out artifact_dir \
        --shape 512x512x16 --shape 4x512x512x16 \
        [--refine-iters 3] [--platforms cpu,tpu] [--selftest] [KEY VALUE ...]

Each --shape is h x w x p (single-image program) or n x h x w x p (batched
rows program); values snap UP to the serving bucket tables (serving.py:27-29).
--selftest reloads the artifact and checks a random input against the live
estimator bit-for-bit before reporting success.
"""

import argparse
import types

import numpy as np

import _init_paths  # noqa: F401


def parse_args():
    p = argparse.ArgumentParser(description="BUCTD serving export")
    p.add_argument("--cfg", required=True)
    p.add_argument("--checkpoint", default=None,
                   help=".pth (converted in-process) or orbax dir")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--shape", action="append", required=True,
                   help="HxWxP or NxHxWxP bucket to export (repeatable)")
    p.add_argument("--refine-iters", type=int, default=1)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of export lowering platforms")
    p.add_argument("--no-platform-check", action="store_true",
                   help="disable the runtime platform safety check (needed to "
                        "run tpu-lowered artifacts on non-canonical platform "
                        "names like the axon relay)")
    p.add_argument("--selftest", action="store_true",
                   help="reload the artifact and verify against the live "
                        "estimator on a random input")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.serving import PoseEstimator
    from buctd_tpu.serving_export import (ExportedPoseEstimator,
                                          export_estimator)
    from buctd_tpu.utils.relay import ensure_live_backend

    ensure_live_backend()
    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=args.cfg, opts=args.opts, modelDir="", logDir="", dataDir=""))

    shapes = [tuple(int(v) for v in s.lower().split("x"))
              for s in args.shape]
    est = PoseEstimator(cfg, checkpoint=args.checkpoint,
                        refine_iters=args.refine_iters)
    manifest = export_estimator(
        est, shapes, args.out,
        platforms=tuple(args.platforms.split(",")),
        check_platform=not args.no_platform_check)
    print(f"# exported {len(manifest['programs'])} programs "
          f"({manifest['model_name']}, refine_iters={args.refine_iters}) "
          f"-> {args.out}")

    if args.selftest:
        loaded = ExportedPoseEstimator(args.out)
        key = next(k for k in manifest["programs"] if len(k) == 3)
        h, w, p = key
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        conds = rng.uniform(0.2 * w, 0.8 * w,
                            (p, est.num_joints, 2)).astype(np.float32)
        want = est.predict(img, conds)
        got = loaded.predict(img, conds)
        np.testing.assert_allclose(got, want, atol=1e-5)
        print("# selftest ok: exported program matches the live estimator")


if __name__ == "__main__":
    main()
