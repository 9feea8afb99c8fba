"""Read images from zip archives via 'archive.zip@/inner/path' syntax
(reference: lib/utils/zipreader.py:23-46).  Zip handles are cached per path."""

from __future__ import annotations

import os
import zipfile

import numpy as np

_zip_cache: dict = {}


def split_zip_path(path: str):
    pos = path.index("@")
    return path[:pos], path[pos + 2:]  # reference skips the char after '@' too


def imread(filename: str, flags=None):
    import cv2

    if flags is None:
        flags = cv2.IMREAD_COLOR
    path_zip, path_img = split_zip_path(filename)
    if not os.path.isfile(path_zip):
        raise FileNotFoundError(f"zip file '{path_zip}' is not found")
    zf = _zip_cache.get(path_zip)
    if zf is None:
        zf = _zip_cache[path_zip] = zipfile.ZipFile(path_zip, "r")
    data = zf.read(path_img)
    return cv2.imdecode(np.frombuffer(data, np.uint8), flags)
