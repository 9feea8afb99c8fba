"""CoAM-W48 serving bench (preset over tools/bench_forward.py).

Usage: python tools/bench_coam.py [BATCHES...]   (default: 8 16 32 64)
"""

import bench_forward

if __name__ == "__main__":
    bench_forward.main(
        default_cfg="/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml",
        default_label="CoAM-W48", default_batches=(8, 16, 32, 64))
