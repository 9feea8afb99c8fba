#!/bin/sh
# Round-3 TPU measurement queue (run when the axon relay is up).
# Each step appends to /tmp/r3q.log; safe to re-run (compile cache).
set -x
cd /root/repo
python tools/bench_flash.py --perf --parity
python tools/bench_coam.py 64 128 192
python tools/bench_transpose.py 16 64 128
python tools/bench_refine.py 2>/dev/null || true
BUCTD_BENCH_CFG=coam python tools/bench_train.py --cfg experiments/coco/buctd/coam_w48_384x288.yaml 32 64
python tools/bench_epoch.py --samples 256 --batch 64
python tools/bench_epoch.py --samples 256 --batch 64 --device-pipeline --device-synthesis
python bench.py
