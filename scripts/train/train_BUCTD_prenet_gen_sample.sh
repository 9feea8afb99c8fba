#!/usr/bin/env bash
# BUCTD-preNet-W48 on COCO with generative (synthesis) sampling
cd "$(dirname "$0")/../.."

python tools/train.py \
    --cfg experiments/coco/buctd/prenet_w48_384x288.yaml \
    OUTPUT_DIR 'runs/models/preNet_gen' \
    LOG_DIR 'runs/log/preNet_gen' \
    DATASET.TRAIN_IMAGE_DIR 'data/coco/images' \
    DATASET.TRAIN_ANNOTATION_FILE 'data/coco/annotations/person_keypoints_train2017.json' \
    DATASET.TEST_IMAGE_DIR 'data/coco/images' \
    DATASET.TEST_ANNOTATION_FILE 'data/coco/annotations/person_keypoints_val2017.json' \
    TRAIN.USE_BU_BBOX True \
    TEST.USE_BU_BBOX True \
    TEST.COCO_BBOX_FILE 'prediction_file_from_other_model'
