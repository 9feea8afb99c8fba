"""One-command real-data AP-parity runner (BASELINE.md north star).

The day the real datasets/checkpoints exist, this runs the COMPLETE published
protocol from a reference .pth and prints our AP next to the README table with
the <=0.3-delta check:

    python tools/parity_eval.py \\
        --cfg experiments/coco/buctd/prenet_w48_384x288.yaml \\
        --pth /path/to/BUCTD_preNet_coco.pth \\
        --ann /path/to/person_keypoints_val2017_with_cond.json \\
        --img-dir /path/to/val2017 \\
        [--refine-iters 3] [--expected-ap 77.8] [KEY VALUE ...]

Protocol per reference scripts/test/*.sh + README.md:95-111: flip-test with
condition re-rendering (lib/core/function.py:213-236), SHIFT_HEATMAP 1-px shift,
POST_PROCESS +-0.25 px nudge, rescoring box_score x mean-kpt-conf
(lib/dataset/dataloader.py:596-612), OKS-NMS bypass rules (:627-634), and the 3x
iterative refinement for the OCHuman row (README.md:104) — all already wired in
core/function.validate + tools/test.py; this script adds the checkpoint
conversion, the target table, and the pass/fail verdict.  Smoke-tested on the
synthetic tiny-COCO fixtures (tests/test_cli.py::test_parity_eval_cli_smoke).
"""

import argparse
import json
import os
import sys

import _init_paths  # noqa: F401

# README.md table rows keyed by (DATASET.DATASET, MODEL.NAME); value = (AP, note)
REFERENCE_AP = {
    ("coco", "pose_hrnet"): (77.8, "BUCTD-preNet-W48 384x288, PETR conditions "
                                   "(README.md:97)"),
    ("ochuman", "pose_hrnet_coam"): (49.0, "BUCTD-CoAM-W48 384x288, CID-W32 "
                                           "conditions, 3x refinement (val; "
                                           "README.md:104)"),
    ("crowdpose", "pose_hrnet_coam"): (78.5, "BUCTD-CoAM-W48 384x288, PETR "
                                             "conditions (test; README.md:111)"),
}
AP_TOLERANCE = 0.3  # BASELINE.json north star


def parse_args():
    p = argparse.ArgumentParser(description="AP parity vs reference checkpoints")
    p.add_argument("--cfg", required=True)
    p.add_argument("--pth", required=True,
                   help="reference torch checkpoint (.pth) or orbax dir")
    p.add_argument("--ann", required=True, help="annotation json with cond_kpts "
                   "(or a BU-prediction/pose-results json via TEST.COCO_BBOX_FILE)")
    p.add_argument("--img-dir", required=True)
    p.add_argument("--refine-iters", type=int, default=None,
                   help="override TEST.REFINE_ITERS (OCHuman protocol: 3)")
    p.add_argument("--expected-ap", type=float, default=None,
                   help="override the builtin README table target")
    p.add_argument("--out", default="parity_out")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.utils.compcache import enable as enable_compcache

    enable_compcache()
    cfg = default_config()
    update_config(cfg, args)
    cfg.defrost()
    cfg.DATASET.TEST_ANNOTATION_FILE = args.ann
    cfg.DATASET.TEST_IMAGE_DIR = args.img_dir
    cfg.TEST.MODEL_FILE = args.pth
    cfg.OUTPUT_DIR = args.out
    if args.refine_iters is not None:
        cfg.TEST.REFINE_ITERS = int(args.refine_iters)
    # published-protocol switches (scripts/test/*.sh pass these explicitly)
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.POST_PROCESS = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.freeze()

    import jax
    import jax.numpy as jnp

    from buctd_tpu.core.function import validate
    from buctd_tpu.data import Loader, get_dataset, num_input_channels
    from buctd_tpu.models import (compute_dtype, converter_options, get_model)
    from buctd_tpu.parallel import make_mesh, replicate
    from buctd_tpu.utils import create_logger

    logger, out_dir, _ = create_logger(cfg, args.cfg, "parity")
    mesh = make_mesh(cfg)
    model = get_model(cfg, is_train=False, dtype=compute_dtype(cfg, "EVAL_DTYPE"))

    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    sample = jnp.zeros((1, img_h, img_w, num_input_channels(cfg)))
    template = jax.jit(lambda k: model.init(k, sample, train=False))(
        jax.random.PRNGKey(0))
    if args.pth.endswith(".pth") or args.pth.endswith(".pt"):
        from buctd_tpu.convert import load_torch_checkpoint, torch_to_flax
        variables = torch_to_flax(load_torch_checkpoint(args.pth), template,
                                  **converter_options(cfg.MODEL.NAME))
    else:
        from buctd_tpu.train.checkpoint import load_params
        variables = load_params(args.pth, template=template)
    variables = replicate(variables, mesh)

    refine_iters = max(int(cfg.TEST.REFINE_ITERS), 1)
    perf = None
    trajectory = []   # per-round AP (the OCHuman 3x protocol, README.md:104)
    for it in range(refine_iters):
        valid_dataset = get_dataset(cfg, is_train=False)
        valid_loader = Loader(valid_dataset, cfg,
                              batch_size=cfg.TEST.BATCH_SIZE_PER_GPU * mesh.size,
                              num_workers=cfg.WORKERS)
        name_values, perf = validate(cfg, valid_loader, valid_dataset, model,
                                     variables, out_dir, epoch=it, mesh=mesh)
        trajectory.append(float(perf) * 100.0 if perf <= 1.0 else float(perf))
        logger.info("=> parity round %d: AP %.4f", it, perf)
        if it < refine_iters - 1:  # feed results back (README.md:104 protocol)
            # per-process copy: see tools/test.py (proc>0 evaluate output is
            # redirected to proc{q}/ by validate())
            proc_dir = (out_dir if jax.process_index() == 0 else
                        os.path.join(out_dir, f"proc{jax.process_index()}"))
            res_file = os.path.join(proc_dir, "results",
                                    f"keypoints_test_results_epoch{it}.json")
            cfg.defrost()
            cfg.TEST.COCO_BBOX_FILE = res_file
            cfg.TEST.USE_BU_BBOX = True
            cfg.freeze()

    key = (cfg.DATASET.DATASET, cfg.MODEL.NAME)
    expected, note = REFERENCE_AP.get(key, (None, "no README row for this "
                                                  "dataset/model pair"))
    if args.expected_ap is not None:
        expected, note = args.expected_ap, "user-provided target"

    ap = float(perf) * 100.0 if perf <= 1.0 else float(perf)
    if len(trajectory) > 1:
        print("# refine trajectory: AP "
              + " -> ".join(f"{t:.2f}" for t in trajectory))
    print("\n| dataset | model | ours (AP) | reference (AP) | delta | verdict |")
    print("|---|---|---|---|---|---|")
    if expected is None:
        print(f"| {key[0]} | {key[1]} | {ap:.2f} | n/a | n/a | NO-TARGET |")
        print(f"# {note}")
        return 0
    delta = ap - expected
    ok = abs(delta) <= AP_TOLERANCE or delta > 0
    print(f"| {key[0]} | {key[1]} | {ap:.2f} | {expected:.1f} | {delta:+.2f} | "
          f"{'PASS' if ok else 'FAIL'} |")
    print(f"# target: {note}; tolerance {AP_TOLERANCE} AP (BASELINE.json)")
    print(json.dumps({"ap": ap, "expected": expected, "delta": delta,
                      "pass": bool(ok), "refine_trajectory": trajectory}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
