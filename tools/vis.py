"""Keypoint/skeleton plotting CLI surface (reference: tools/vis.py).

The implementation lives in buctd_tpu.utils.skeletons; this module keeps the
reference's import path (`from vis import plot_keypoints`) working.
"""

import _init_paths  # noqa: F401

from buctd_tpu.utils.skeletons import (COCO_KEYPOINT_ORDER, COCO_SKELETON,
                                       CROWDPOSE_KEYPOINT_ORDER,
                                       CROWDPOSE_SKELETON, plot_keypoints)

__all__ = ["plot_keypoints", "COCO_SKELETON", "CROWDPOSE_SKELETON",
           "COCO_KEYPOINT_ORDER", "CROWDPOSE_KEYPOINT_ORDER"]
