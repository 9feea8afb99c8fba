from .warp import warp_affine, crop_images
from .heatmap import (
    gaussian_blur2d,
    generate_target,
    render_condition_colored,
    render_condition_stacked,
    render_condition_plain,
)
from .decode import get_max_preds, get_final_preds, dark_blur

__all__ = [
    "warp_affine",
    "crop_images",
    "gaussian_blur2d",
    "generate_target",
    "render_condition_colored",
    "render_condition_stacked",
    "render_condition_plain",
    "get_max_preds",
    "get_final_preds",
    "dark_blur",
]
