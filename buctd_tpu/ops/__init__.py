from .warp import (warp_affine, warp_affine_aligned, warp_affine_rotated,
                   warp_affine_shear, crop_images, resize_bilinear)
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
    "warp_affine_aligned",
    "warp_affine_rotated",
    "warp_affine_shear",
    "resize_bilinear",
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
