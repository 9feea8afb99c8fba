from .coco_io import COCOIndex
from .coco_eval import COCOKeypointEval

__all__ = ["COCOIndex", "COCOKeypointEval"]
