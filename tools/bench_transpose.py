"""TransPose-H serving bench (preset over tools/bench_forward.py).

Usage: python tools/bench_transpose.py [BATCHES...]   (default: 16 64 128)
"""

import bench_forward

if __name__ == "__main__":
    bench_forward.main(
        default_cfg="/root/repo/experiments/coco/buctd/transpose_h_384x288.yaml",
        default_label="TransPose-H", default_batches=(16, 64, 128))
