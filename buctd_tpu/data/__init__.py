from .coco_io import COCOIndex
from .coco_eval import COCOKeypointEval
from .joints_dataset import JointsDataset, rainbow_colors
from .dataloader import CocoStyleDataset
from .datasets import get_dataset
from .pipeline import Loader, collate, make_input_fn, make_target_fn, num_input_channels
from .pose_synthesis import synthesize_pose

__all__ = ["COCOIndex", "COCOKeypointEval", "JointsDataset", "CocoStyleDataset",
           "get_dataset", "Loader", "collate", "make_input_fn", "make_target_fn",
           "num_input_channels", "synthesize_pose", "rainbow_colors"]
