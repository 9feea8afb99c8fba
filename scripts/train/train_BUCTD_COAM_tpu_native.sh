#!/usr/bin/env bash
# TPU-native launch of BUCTD-CoAM-W48 generative-sampling training: the same
# recipe as train_BUCTD_COAM_gen_sample.sh with every accelerator-side pipeline
# knob on — all-on-device batch preprocessing (TPU.DEVICE_PIPELINE), on-device
# condition synthesis (TPU.DEVICE_SYNTHESIS, 143x the host sampler), and the
# pallas rotated-warp engine (TPU.WARP_ENGINE=auto picks it on TPU).
#
# Multi-host (pod slice): run the same command on every host and add
#   --coordinator <host0:port> --num-processes <N> --process-id <rank>
# (auto-detected on Cloud TPU).
cd "$(dirname "$0")/../.."

python tools/train.py \
    --cfg experiments/coco/buctd/coam_w48_384x288.yaml \
    DATASET.TRAIN_IMAGE_DIR data/coco/images \
    DATASET.TRAIN_ANNOTATION_FILE data/coco/annotations/person_keypoints_train2017.json \
    DATASET.TEST_IMAGE_DIR data/coco/images \
    DATASET.TEST_ANNOTATION_FILE data/coco/annotations/person_keypoints_val2017.json \
    DATASET.COLORED True \
    DATASET.SYNTHESIS_POSE True \
    TRAIN.USE_BU_BBOX True \
    TRAIN.BATCH_SIZE_PER_GPU 32 \
    TEST.BATCH_SIZE_PER_GPU 32 \
    TEST.USE_BU_BBOX True \
    TPU.DEVICE_PIPELINE True \
    TPU.DEVICE_SYNTHESIS True \
    TPU.PREFETCH 2 \
    TPU.WARP_ENGINE auto \
    TPU.COMPUTE_DTYPE bfloat16
# Larger effective batches on memory-constrained chips: add
#   TRAIN.GRAD_ACCUM_STEPS 4      (4 x 32 x mesh-size effective batch)
# More HBM headroom (b192+/chip): add  TPU.REMAT True  (REMAT_MODE modules)
