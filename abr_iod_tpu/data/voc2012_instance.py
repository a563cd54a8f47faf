"""VOC2012/SBD instance-segmentation dataset.

Reference: data/datasets/voc2012_Instance.py (PascalVOCDataset2012, a
CocoDetection-based VOC-SBD loader used by the Mask-on ablation).  Here
it composes COCODataSource (COCO-format json) with polygon→mask
rasterization, yielding mask targets alongside the detection records.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from .coco import COCODataSource
from ..structures.masks import polygons_to_mask


class VOC2012InstanceDataSource(COCODataSource):
    """COCO-format VOC2012/SBD annotations with instance masks."""

    def __init__(self, ann_file: str, img_root: str, is_train: bool = True,
                 num_old_categories: int = 15, num_new_categories: int = 5):
        super().__init__(ann_file, img_root, is_train,
                         num_old_categories, num_new_categories)
        with open(ann_file) as f:
            data = json.load(f)
        self._segm = {}
        for a in data["annotations"]:
            self._segm[a["id"]] = a.get("segmentation")

    def annotation(self, index: int) -> Dict:
        rec = super().annotation(index)
        img_id = self.ids[index]
        h, w = rec["height"], rec["width"]
        masks = []
        for a in self._filtered[img_id]:
            seg = self._segm.get(a["id"])
            if isinstance(seg, list) and seg:
                masks.append(polygons_to_mask(seg, h, w))
            else:
                # box-as-mask fallback when no polygon is present
                m = np.zeros((h, w), bool)
                x, y, bw, bh = (int(v) for v in a["bbox"])
                m[y : y + bh, x : x + bw] = True
                masks.append(m)
        rec["masks"] = (
            np.stack(masks) if masks else np.zeros((0, h, w), bool)
        )
        return rec
