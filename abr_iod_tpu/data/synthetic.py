"""Synthetic VOC generator.

Writes a real on-disk VOC2007-style tree (JPEGImages/, Annotations/,
ImageSets/Main with per-class ``<cls>_<split>.txt`` membership files) so
the ENTIRE pipeline — VOCDataSource, PBS crops, Mem JPEGs, tools/ CLI —
is exercised through the same file formats the reference consumes.
Images are colored rectangles on noise; each "class" has a distinct hue
so learned models can actually fit them in smoke tests.
"""

from __future__ import annotations

import os
import random
import xml.etree.ElementTree as ET
from typing import Sequence

import numpy as np

from ..config.catalog import VOC_CLASSES


def _class_color(label: int):
    rng = np.random.RandomState(label * 7919)
    return rng.randint(60, 255, size=3)


def make_synthetic_voc(
    root: str,
    n_images: int = 40,
    classes: Sequence[str] = VOC_CLASSES,
    splits=("trainval", "test"),
    image_hw=(240, 320),
    max_objects: int = 4,
    seed: int = 0,
    mixed_orientations: bool = False,
):
    """Create a synthetic VOC tree under `root` covering every split.

    mixed_orientations=True transposes every third image so loaders'
    dual-orientation grouping has portrait inputs to exercise (real VOC
    is a landscape/portrait mix).
    """
    rng = np.random.RandomState(seed)
    from PIL import Image

    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    per_split_ids = {s: [] for s in splits}
    membership = {s: {c: {} for c in classes} for s in splits}

    img_counter = 0
    for split in splits:
        for _ in range(n_images):
            img_id = f"{img_counter:06d}"
            per_split_ids[split].append(img_id)
            h, w = image_hw
            if mixed_orientations and img_counter % 3 == 2:
                h, w = w, h
            img_counter += 1

            img = rng.randint(0, 60, size=(h, w, 3)).astype(np.uint8)
            n_obj = rng.randint(1, max_objects + 1)
            objects = []
            present = set()
            for _ in range(n_obj):
                cls_name = classes[rng.randint(len(classes))]
                label = VOC_CLASSES.index(cls_name) + 1
                bw = rng.randint(int(w * 0.15), int(w * 0.5))
                bh = rng.randint(int(h * 0.15), int(h * 0.5))
                x1 = rng.randint(0, w - bw)
                y1 = rng.randint(0, h - bh)
                color = _class_color(label)
                img[y1 : y1 + bh, x1 : x1 + bw] = color
                # inner marker so crops are distinguishable from background
                img[y1 + bh // 4 : y1 + 3 * bh // 4, x1 + bw // 4 : x1 + 3 * bw // 4] = (
                    255 - color
                )
                objects.append((cls_name, x1 + 1, y1 + 1, x1 + bw, y1 + bh))  # 1-based
                present.add(cls_name)

            Image.fromarray(img).save(os.path.join(root, "JPEGImages", f"{img_id}.jpg"))
            _write_annotation(root, img_id, h, w, objects)
            for c in classes:
                membership[split][c][img_id] = 1 if c in present else -1

    for split in splits:
        with open(os.path.join(root, "ImageSets", "Main", f"{split}.txt"), "w") as f:
            f.write("\n".join(per_split_ids[split]) + "\n")
        for c in classes:
            path = os.path.join(root, "ImageSets", "Main", f"{c}_{split}.txt")
            with open(path, "w") as f:
                for img_id in per_split_ids[split]:
                    flag = membership[split][c][img_id]
                    # canonical VOC format: "id  1" present, "id -1" absent
                    f.write(f"{img_id}  1\n" if flag == 1 else f"{img_id} -1\n")
    return per_split_ids


def _write_annotation(root, img_id, h, w, objects):
    ann = ET.Element("annotation")
    size = ET.SubElement(ann, "size")
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "width").text = str(w)
    ET.SubElement(size, "depth").text = "3"
    for cls_name, x1, y1, x2, y2 in objects:
        obj = ET.SubElement(ann, "object")
        ET.SubElement(obj, "name").text = cls_name
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(x1)
        ET.SubElement(bb, "ymin").text = str(y1)
        ET.SubElement(bb, "xmax").text = str(x2)
        ET.SubElement(bb, "ymax").text = str(y2)
    tree = ET.ElementTree(ann)
    tree.write(os.path.join(root, "Annotations", f"{img_id}.xml"))


def make_synthetic_coco(
    root: str,
    n_images: int = 24,
    image_hw=(240, 320),
    max_objects: int = 4,
    seed: int = 0,
    keypoints: bool = False,
    categories: Sequence[str] = ("person",),
    splits=("train", "test"),
):
    """COCO-json synthetic set for the mask / keypoint CLI families.

    Same colored-rectangle images as make_synthetic_voc, but annotated
    in COCO format so the json-backed sources (COCODataSource /
    VOC2012InstanceDataSource — reference data/datasets/coco.py) consume
    them: every object carries a polygon segmentation (the rectangle)
    and, with ``keypoints=True``, a 17-point person-keypoint vector laid
    out on a deterministic 4x4 grid inside the box (vis=2) with the
    nose at the box center — enough structure for heads to fit in smoke
    tests and for the decode path to be exercised end-to-end.

    Writes ``<root>/img/*.jpg`` + ``<root>/ann_<split>.json``.
    """
    rng = np.random.RandomState(seed)
    from PIL import Image

    img_dir = os.path.join(root, "img")
    os.makedirs(img_dir, exist_ok=True)
    img_counter = 0
    for split in splits:
        images, annotations = [], []
        ann_id = 1
        for _ in range(n_images):
            img_id = img_counter + 1
            img_counter += 1
            h, w = image_hw
            img = rng.randint(0, 60, size=(h, w, 3)).astype(np.uint8)
            n_obj = rng.randint(1, max_objects + 1)
            for _ in range(n_obj):
                cat_id = int(rng.randint(1, len(categories) + 1))
                bw = rng.randint(int(w * 0.2), int(w * 0.5))
                bh = rng.randint(int(h * 0.2), int(h * 0.5))
                x1 = rng.randint(0, w - bw)
                y1 = rng.randint(0, h - bh)
                color = _class_color(cat_id)
                img[y1:y1 + bh, x1:x1 + bw] = color
                img[y1 + bh // 4:y1 + 3 * bh // 4,
                    x1 + bw // 4:x1 + 3 * bw // 4] = 255 - color
                ann = {
                    "id": ann_id, "image_id": img_id, "category_id": cat_id,
                    "bbox": [float(x1), float(y1), float(bw), float(bh)],
                    "area": float(bw * bh), "iscrowd": 0,
                    "segmentation": [[
                        float(x1), float(y1), float(x1 + bw), float(y1),
                        float(x1 + bw), float(y1 + bh), float(x1), float(y1 + bh),
                    ]],
                }
                if keypoints:
                    kps = []
                    for k in range(17):
                        if k == 0:  # nose at the box center
                            kx, ky = x1 + bw / 2, y1 + bh / 2
                        else:
                            gx, gy = (k - 1) % 4, (k - 1) // 4
                            kx = x1 + bw * (0.2 + 0.2 * gx)
                            ky = y1 + bh * (0.2 + 0.2 * gy)
                        kps += [float(kx), float(ky), 2]
                    ann["keypoints"] = kps
                    ann["num_keypoints"] = 17
                annotations.append(ann)
                ann_id += 1
            fname = f"synth_{img_id:06d}.jpg"
            Image.fromarray(img).save(os.path.join(img_dir, fname))
            images.append({"id": img_id, "file_name": fname,
                           "height": h, "width": w})
        import json

        with open(os.path.join(root, f"ann_{split}.json"), "w") as f:
            json.dump({
                "images": images,
                "annotations": annotations,
                "categories": [
                    {"id": i + 1, "name": c} for i, c in enumerate(categories)
                ],
            }, f)
    return root
