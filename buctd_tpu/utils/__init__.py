from .logging_utils import create_logger, MetricWriter, set_seed
from .summary import get_model_summary
from .vis import save_batch_heatmaps, save_batch_image_with_joints, save_debug_images

__all__ = ["create_logger", "MetricWriter", "set_seed", "get_model_summary",
           "save_debug_images", "save_batch_heatmaps",
           "save_batch_image_with_joints"]
