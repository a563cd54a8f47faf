"""Pascal VOC data source with class-incremental image selection.

Host-side replacement for the reference's dataset classes
(maskrcnn_benchmark/data/datasets/voc_abr.py:27-300).  This layer only
parses XML + image-set files and yields numpy records; all augmentation
and batching happens downstream (transforms.py / abr_fusion.py).

Selection modes, mirroring voc_abr.py:337-447:
  * ``train_new``    — images containing a new class (per-class
    ``<cls>_<split>.txt`` files; entries with flag -1 skipped, difficult
    0 skipped in training) — the father/first-task + ABR training modes
  * ``test_all``     — images of new+old classes, difficult kept
  * ``sample_new``   — sampling (PBS) mode: new classes, no difficult

Annotation filtering (voc_abr.py:877-927): boxes become 0-based
(-1 on each coordinate); in training old/excluded-class GTs are dropped;
in test all non-excluded GTs are kept.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Sequence

import numpy as np

from ..config.catalog import VOC_CLASSES

CLASS_TO_IND = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}  # 1-based, 0=bg


class VOCDataSource:
    def __init__(
        self,
        root: str,
        split: str,
        mode: str,  # train_new | test_all | sample_new
        old_classes: Sequence[str] = (),
        new_classes: Sequence[str] = (),
        excluded_classes: Sequence[str] = (),
        keep_difficult: bool = False,
    ):
        self.root = root
        self.split = split
        self.mode = mode
        self.old_classes = tuple(old_classes)
        self.new_classes = tuple(new_classes)
        self.excluded_classes = tuple(excluded_classes)
        self.keep_difficult = keep_difficult

        self._annopath = os.path.join(root, "Annotations", "%s.xml")
        self._imgpath = os.path.join(root, "JPEGImages", "%s.jpg")
        self._imgsetpath = os.path.join(root, "ImageSets", "Main", "%s.txt")

        if mode == "train_new":
            self.ids = self._ids_for_classes(self.new_classes, include_difficult=False)
        elif mode == "sample_new":
            self.ids = self._ids_for_classes(self.new_classes, include_difficult=False)
        elif mode == "test_all":
            self.ids = self._ids_for_classes(
                self.new_classes + self.old_classes, include_difficult=True
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")

    def _ids_for_classes(self, classes, include_difficult: bool) -> List[str]:
        ids: List[str] = []
        seen = set()
        for category in classes:
            path = self._imgsetpath % f"{category}_{self.split}"
            with open(path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 2:
                        continue
                    img_id, flag = parts[0], parts[1]
                    if flag == "-1":
                        continue
                    if flag == "0" and not include_difficult:
                        continue  # difficult-only membership skipped in training
                    if img_id not in seen:
                        seen.add(img_id)
                        ids.append(img_id)
        return ids

    def __len__(self):
        return len(self.ids)

    def image_path(self, index: int) -> str:
        return self._imgpath % self.ids[index]

    def annotation(self, index: int) -> Dict:
        """Parsed + filtered annotation for one image."""
        img_id = self.ids[index]
        anno = ET.parse(self._annopath % img_id).getroot()
        is_train_like = self.mode in ("train_new", "sample_new")

        boxes, labels, difficult = [], [], []
        for obj in anno.iter("object"):
            is_difficult = int(obj.find("difficult").text) == 1
            if not self.keep_difficult and is_difficult:
                continue
            name = obj.find("name").text.lower().strip()
            if name in self.excluded_classes:
                continue
            if is_train_like and name in self.old_classes:
                continue
            if name not in CLASS_TO_IND:
                continue
            bb = obj.find("bndbox")
            box = [
                float(bb.find(t).text) - 1.0  # 0-based (voc_abr.py:899-903)
                for t in ("xmin", "ymin", "xmax", "ymax")
            ]
            boxes.append(box)
            labels.append(CLASS_TO_IND[name])
            difficult.append(is_difficult)

        size = anno.find("size")
        return {
            "img_id": img_id,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32),
            "difficult": np.asarray(difficult, bool),
            "height": int(size.find("height").text),
            "width": int(size.find("width").text),
        }

    def load_image(self, index: int) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.open(self.image_path(index)).convert("RGB"))
