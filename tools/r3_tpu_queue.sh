#!/bin/sh
# Round-3 TPU measurement queue (run when the axon relay is up):
#   sh tools/r3_tpu_queue.sh 2>&1 | tee /tmp/r3q.log
# Safe to re-run — the persistent compile cache skips finished compiles.
set -x
cd /root/repo
python tools/bench_flash.py --perf --parity
python tools/bench_stem.py 256 384
python tools/bench_coam.py 64 128 192
python tools/bench_transpose.py 16 64 128
python tools/bench_refine.py
python tools/bench_train.py --cfg experiments/coco/buctd/coam_w48_384x288.yaml 32 64
python tools/bench_epoch.py --samples 256 --batch 64
python tools/bench_epoch.py --samples 256 --batch 64 --prefetch 0
python tools/bench_epoch.py --samples 256 --batch 64 --device-pipeline --device-synthesis
python tools/bench_epoch.py --samples 256 --batch 64 --device-pipeline --device-synthesis --prefetch 0
python bench.py
