#!/usr/bin/env bash
# Eval BUCTD-preNet-W48 on COCO val with PETR conditions + flip-test (+ optional 3x refinement)
cd "$(dirname "$0")/../.."

python tools/test.py \
    --cfg experiments/coco/buctd/prenet_w48_384x288.yaml \
    OUTPUT_DIR 'outputs/preNet_gen/' \
    LOG_DIR 'logs/preNet_gen/' \
    DATASET.TEST_IMAGE_DIR 'data/coco/images' \
    DATASET.TEST_ANNOTATION_FILE 'data/coco/annotations/person_keypoints_val2017.json' \
    TEST.BATCH_SIZE_PER_GPU 32 \
    TEST.USE_GT_BBOX False \
    TEST.USE_BU_BBOX True \
    TEST.FLIP_TEST True \
    TEST.POST_PROCESS True \
    TEST.MODEL_FILE 'models/BUCTD_preNet_W48_384x288.pth' \
    TEST.COCO_BBOX_FILE 'your_bu/petr_predictions.json' \
    TEST.REFINE_ITERS 1
