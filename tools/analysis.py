"""Offline binned-analysis CLI (reference: lib/analysis run as ad-hoc scripts).

Examples:
  python tools/analysis.py binned --gt ann.json --dt results.json --out out/
  python tools/analysis.py rank   --gt ann.json --dt results.json
  python tools/analysis.py qualitative --gt ann.json --dt results.json \\
      --images data/coco/images --out out/qual
"""

import argparse
import json

import _init_paths  # noqa: F401


def main():
    ap = argparse.ArgumentParser(description="BUCTD offline analysis")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("binned", help="occlusion x num-kpt binned AP matrices")
    b.add_argument("--gt", required=True)
    b.add_argument("--dt", required=True)
    b.add_argument("--out", default=None, help="write benchmark_*.pdf plots here")

    r = sub.add_parser("rank", help="per-instance OKS ranking (worst first)")
    r.add_argument("--gt", required=True)
    r.add_argument("--dt", required=True)
    r.add_argument("--top", type=int, default=20)

    q = sub.add_parser("qualitative", help="side-by-side GT/pred dumps per bin")
    q.add_argument("--gt", required=True)
    q.add_argument("--dt", required=True)
    q.add_argument("--images", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--worst", type=int, default=20)

    args = ap.parse_args()

    if args.cmd == "binned":
        from buctd_tpu.analysis import coco_evaluation
        stats = coco_evaluation(args.gt, args.dt, output_dir=args.out,
                                make_plots=bool(args.out))
        print(json.dumps({k: v.tolist() for k, v in stats.items()}, indent=2))
    elif args.cmd == "rank":
        from buctd_tpu.analysis import sort_instance_ap
        from buctd_tpu.data import COCOIndex
        ranked = sort_instance_ap(COCOIndex(args.gt), args.dt)
        for oks, ann_id, _ in ranked[:args.top]:
            print(f"ann {ann_id}: OKS {oks:.3f}")
    else:
        from buctd_tpu.analysis.qualitative_evaluation import binwise_coco_evaluation
        binwise_coco_evaluation(args.gt, args.dt, args.images, args.out,
                                worst_k=args.worst)
        print(f"wrote qualitative dumps to {args.out}")


if __name__ == "__main__":
    main()
