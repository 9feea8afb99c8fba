"""ctypes bindings for the native C++ runtime library (native/nms.cpp).

Counterpart of the reference's compiled extensions (lib/nms/cpu_nms.pyx,
gpu_nms.pyx + nms_kernel.cu).  The library is built with ``make -C native``; if the
.so is missing we try to build it once, and otherwise fall back to the pure-numpy
implementation in ops/nms.py (the reference eval path never calls the native box-NMS
either — nms/nms.py:13-14 imports it but uses the pure OKS functions).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbuctd_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # toolchain unavailable -> numpy fallback
            logger.warning("native build failed (%s); using numpy NMS", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("failed to load %s (%s); using numpy NMS", _LIB_PATH, e)
        return None
    for name in ("buctd_cpu_nms", "buctd_mask_nms"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                       ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def cpu_nms(dets: np.ndarray, thresh: float) -> list:
    """Greedy box NMS, exact cpu_nms.pyx semantics.  Falls back to numpy."""
    lib = _load()
    dets = np.ascontiguousarray(dets, np.float32)
    n = len(dets)
    if n == 0:
        return []
    if lib is None:
        from .nms import nms as numpy_nms
        return numpy_nms(dets, thresh)
    keep = np.empty(n, np.int32)
    num = lib.buctd_cpu_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            n, ctypes.c_float(thresh),
                            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:num].tolist()


def gpu_nms(dets: np.ndarray, thresh: float, device_id: int = 0) -> list:
    """The reference's gpu_nms surface (gpu_nms.pyx:16-34): sort by score, run the
    bitmask kernel, return ORIGINAL indices of kept boxes.  device_id is accepted
    for API compatibility; on a TPU host this runs the native mask kernel."""
    del device_id
    dets = np.ascontiguousarray(dets, np.float32)
    n = len(dets)
    if n == 0:
        return []
    order = dets[:, 4].argsort()[::-1]
    sorted_dets = np.ascontiguousarray(dets[order])
    lib = _load()
    if lib is None:
        from .nms import nms as numpy_nms
        return numpy_nms(dets, thresh)
    keep = np.empty(n, np.int32)
    num = lib.buctd_mask_nms(
        sorted_dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return order[keep[:num]].tolist()
