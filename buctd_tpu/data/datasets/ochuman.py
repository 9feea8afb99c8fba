"""OCHuman (COCO-17 skeleton; eval via the inherited COCO path) —
lib/dataset/ochuman.py:17-97."""

from __future__ import annotations

from .coco import COCODataset


class OCHumanDataset(COCODataset):
    pass
