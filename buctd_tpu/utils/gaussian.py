"""Depthwise Gaussian smoothing (reference: lib/utils/gaussian.py:7-70).

The reference wraps a fixed Gaussian kernel in an nn.Module with depthwise conv2d;
here it's a jit-friendly callable built on the separable blur in ops/heatmap.py
(same math — per-channel separable filtering, kernel normalized to sum 1).
"""

from __future__ import annotations

import numpy as np

from ..ops.heatmap import _sep_blur


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    """exp(-((x-mean)/sigma)^2 / 2), normalized to sum 1 (gaussian.py:27-45)."""
    mean = (kernel_size - 1) / 2.0
    x = np.arange(kernel_size, dtype=np.float64)
    k = np.exp(-(((x - mean) / sigma) ** 2) / 2.0)
    return (k / k.sum()).astype(np.float32)


class GaussianSmoothing:
    """Callable matching the reference module's surface: smooth(x) with
    x (..., H, W, C) NHWC; channels filtered independently."""

    def __init__(self, channels: int = 17, kernel_size: int = 11,
                 sigma: float = 6.0, dim: int = 2):
        assert dim == 2, "only 2-D smoothing is used by the reference"
        del channels  # depthwise by construction in NHWC separable filtering
        self.kernel = gaussian_kernel1d(kernel_size, sigma)

    def __call__(self, x):
        return _sep_blur(x, self.kernel, "reflect")
