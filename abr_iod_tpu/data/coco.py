"""COCO incremental dataset (reference: data/datasets/coco.py).

Pure-json implementation (no pycocotools / torchvision dependency) with
the reference's class-incremental semantics:
  * categories are re-indexed ALPHABETICALLY to contiguous 1..80
    (coco.py:34-43, convert_cats_from_original_order_to_alphabetical_
    order:81-90) so "first K classes" splits are stable
  * the old/new split is over the ORIGINAL coco-id order
    (dict_slice over coco_ids_to_cats, coco.py:120-185):
    train keeps images/annotations containing new categories only,
    test keeps old+new
  * images without valid annotations are dropped (has_valid_annotation,
    coco.py:104-117); crowd annotations are filtered

Same record interface as VOCDataSource so the loader/driver work
unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

# alphabetical contiguous labels 1..80 (reference COCO_CATS order)
COCO_CATS = (
    "airplane", "apple", "backpack", "banana", "baseball bat", "baseball glove",
    "bear", "bed", "bench", "bicycle", "bird", "boat", "book", "bottle", "bowl",
    "broccoli", "bus", "cake", "car", "carrot", "cat", "cell phone", "chair",
    "clock", "couch", "cow", "cup", "dining table", "dog", "donut", "elephant",
    "fire hydrant", "fork", "frisbee", "giraffe", "hair drier", "handbag",
    "horse", "hot dog", "keyboard", "kite", "knife", "laptop", "microwave",
    "motorcycle", "mouse", "orange", "oven", "parking meter", "person", "pizza",
    "potted plant", "refrigerator", "remote", "sandwich", "scissors", "sheep",
    "sink", "skateboard", "skis", "snowboard", "spoon", "sports ball",
    "stop sign", "suitcase", "surfboard", "teddy bear", "tennis racket", "tie",
    "toaster", "toilet", "toothbrush", "traffic light", "train", "truck", "tv",
    "umbrella", "vase", "wine glass", "zebra",
)
CAT_TO_ALPHA_LABEL = {c: i + 1 for i, c in enumerate(COCO_CATS)}


class COCODataSource:
    def __init__(
        self,
        ann_file: str,
        img_root: str,
        is_train: bool = True,
        num_old_categories: int = 70,
        num_new_categories: int = 10,
        contiguous_labels: bool = False,
    ):
        self.img_root = img_root
        self.is_train = is_train
        with open(ann_file) as f:
            data = json.load(f)

        # original coco id order (ascending id), as coco_ids_to_cats iterates
        cats_by_id = sorted(
            ((c["id"], c["name"]) for c in data["categories"]), key=lambda x: x[0]
        )
        id_order = [cid for cid, _ in cats_by_id]
        self.id_to_name = dict(cats_by_id)
        # label mapping: COCO-id jsons use the alphabetical re-indexing
        # keyed on the ORIGINAL coco category id (reference coco.py:81-90's
        # global coco_ids table — applies to subsets too, as long as the
        # names/ids are COCO's); non-COCO category sets (e.g. the VOC2012
        # instance jsons) fall back to the reference's
        # json_category_id_to_contiguous_id (sorted-id order).
        # contiguous_labels=True forces the sorted-id mapping for jsons
        # whose categories happen to reuse COCO names but target a small
        # head (the synthetic person-keypoint set: alphabetical 'person'
        # is label 50, which overflows a 2-class head and NaN-poisons the
        # box losses through OOB fill-mode gathers).
        if not contiguous_labels and all(
            n in CAT_TO_ALPHA_LABEL for _, n in cats_by_id
        ):
            self._label_of = {
                cid: CAT_TO_ALPHA_LABEL[n] for cid, n in cats_by_id
            }
        else:
            self._label_of = {cid: i + 1 for i, cid in enumerate(id_order)}

        # contiguous-label → display name (index 0 = background), for eval
        # reporting (run_test's per-class AP line)
        n_labels = max(self._label_of.values(), default=0)
        self.label_names = ["__background__"] * (n_labels + 1)
        for cid, name in cats_by_id:
            self.label_names[self._label_of[cid]] = name

        new_ids = set(id_order[num_old_categories : num_old_categories + num_new_categories])
        seen_ids = set(id_order[: num_old_categories + num_new_categories])
        self.included_ids = new_ids if is_train else seen_ids

        self.images: Dict[int, dict] = {im["id"]: im for im in data["images"]}
        anns_by_img: Dict[int, List[dict]] = {}
        for a in data["annotations"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.ids: List[int] = []
        self._filtered: Dict[int, List[dict]] = {}
        self._crowds: Dict[int, List[dict]] = {}
        for img_id in sorted(self.images.keys()):
            # image selection runs over ALL annotations INCLUDING crowds,
            # exactly like the reference (coco.py:197-207 loads with
            # iscrowd=None for has_valid_annotation and the class checks);
            # crowds are filtered from the usable targets only afterwards
            # (__getitem__, coco.py:227)
            anno = anns_by_img.get(img_id, [])
            if not anno:
                continue
            # drop all-degenerate-box images (has_valid_annotation)
            if all(any(o <= 1 for o in a["bbox"][2:]) for a in anno):
                continue
            # NOTE: unlike stock maskrcnn-benchmark (which keeps every
            # test image), the ABR fork's test mode ALSO drops images
            # with no seen-category annotation — test_class_data_check
            # gates both modes (reference coco.py:153-169 applied at
            # :203-207).  Matching that is deliberate: eval runs over
            # the dataset's filtered id list.
            kept_all = [a for a in anno if a["category_id"] in self.included_ids]
            if not kept_all:
                continue
            self.ids.append(img_id)
            self._filtered[img_id] = [
                a for a in kept_all if not a.get("iscrowd", 0)
            ]
            if not is_train:
                # crowd regions of evaluated categories stay visible to the
                # eval protocol as ignore regions (the reference evaluates
                # through pycocotools on the FULL gt json, where iscrowd
                # annotations are never positives but absorb detections —
                # cocoeval.py evaluateImg)
                self._crowds[img_id] = [
                    a for a in kept_all if a.get("iscrowd", 0)
                ]

    def __len__(self):
        return len(self.ids)

    def image_path(self, index: int) -> str:
        return os.path.join(self.img_root, self.images[self.ids[index]]["file_name"])

    def annotation(self, index: int) -> Dict:
        img_id = self.ids[index]
        info = self.images[img_id]
        boxes, labels, crowd, areas = [], [], [], []
        for a in self._filtered[img_id]:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])  # xywh → xyxy
            labels.append(self._label_of[a["category_id"]])
            crowd.append(False)
            areas.append(float(a.get("area", w * h)))
        for a in self._crowds.get(img_id, ()):
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(self._label_of[a["category_id"]])
            crowd.append(True)
            areas.append(float(a.get("area", w * h)))
        rec = {
            "img_id": str(img_id),
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32),
            "difficult": np.zeros(len(labels), bool),
            "iscrowd": np.asarray(crowd, bool),
            "areas": np.asarray(areas, np.float64),
            "height": int(info["height"]),
            "width": int(info["width"]),
        }
        # person-keypoint annotations ride along when the json carries them
        # (reference coco.py:236-239 builds a Keypoints field per target);
        # [N, K, 3] (x, y, vis) in original image coordinates, crowds
        # excluded (same rows as boxes/labels)
        if any("keypoints" in a for a in self._filtered[img_id]):
            k = max(len(a.get("keypoints", ())) // 3
                    for a in self._filtered[img_id])
            kps = np.zeros((len(self._filtered[img_id]), k, 3), np.float32)
            for i, a in enumerate(self._filtered[img_id]):
                v = np.asarray(a.get("keypoints", ()), np.float32)
                if v.size:
                    kps[i, : v.size // 3] = v.reshape(-1, 3)
            # crowd rows (appended after filtered) carry no keypoints
            if len(boxes) > len(kps):
                kps = np.concatenate(
                    [kps, np.zeros((len(boxes) - len(kps), k, 3), np.float32)]
                )
            rec["keypoints"] = kps
        return rec

    def load_image(self, index: int) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.open(self.image_path(index)).convert("RGB"))
