"""Box-rehearsal memory lifecycle (the reference's ``Mem``,
tools/extract_memory.py:17-267).

Same on-disk format — a directory of ``{class_id}_{index:05d}.jpg``
crops — so memories are interchangeable with the reference's.  Selection
strategies:
  * random  (extract_memory.py:83-109)
  * mean    — distance to the L2-normalized class-mean of the pooled
    channel-mean RoI features (:111-161)
  * herding — iCaRL greedy center matching (:163-218).  The reference
    has a latent bug here (``_ind_bbox_per_cls`` used before assignment,
    :208 — SURVEY.md §2.1); fixed in this implementation.

Quota: ceil(mem_size / |all classes|) per class (:61).  update_memory:
at step 1 copy the step-0 memory forward within quota; at step >1 prune
over-quota crops of previous classes (:238-267).
"""

from __future__ import annotations

import math
import os
import random
import shutil
from typing import List, Optional

import numpy as np


class Mem:
    def __init__(self, cfg, step: int = 0, current_mem_path: Optional[str] = None,
                 img_root: Optional[str] = None):
        self.new_classes = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES)
        self.old_classes = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES)
        self.all_classes = self.old_classes + self.new_classes
        self.cfg = cfg
        self.mem_type = cfg.MEM_TYPE
        self.mem_size = int(cfg.MEM_BUFF)
        self.step = step
        self.img_root = img_root or os.path.join(
            os.environ.get("ABR_IOD_DATA_DIR", "datasets"), "voc/VOC2007"
        )
        self._imgpath = os.path.join(self.img_root, "JPEGImages", "%s.jpg")

        self.current_mem_name = f"{self.mem_type}_{self.mem_size}"
        self.current_mem_path = current_mem_path
        self.first_mem_path = None
        self.exemplar: List[str] = []

        if step == 0:
            if current_mem_path and os.path.isdir(current_mem_path):
                self.exemplar = sorted(os.listdir(current_mem_path))
        elif step == 1:
            src_dir = os.path.split(str(cfg.MODEL.SOURCE_WEIGHT))[0]
            self.first_mem_path = os.path.join(src_dir, self.current_mem_name)
            if os.path.isdir(self.first_mem_path):
                self.exemplar = sorted(os.listdir(self.first_mem_path))
        else:
            self.current_mem_path = os.path.join(
                f"output/{cfg.get('TASK', 'task')}/{cfg.get('NAME', 'name')}",
                self.current_mem_name,
            ) if current_mem_path is None else current_mem_path
            if os.path.isdir(self.current_mem_path):
                self.exemplar = sorted(os.listdir(self.current_mem_path))

        self.num_current_classes = len(self.new_classes)
        self.num_bbox_per_cls = math.ceil(self.mem_size / max(len(self.all_classes), 1))
        self.current_mem_info: List[List[dict]] = []
        self.current_features: List[List[np.ndarray]] = []

    # ------------------------------------------------------------------
    def _pad_class(self, i: int):
        """Fill deficits by repeating entries (extract_memory.py:92-97)."""
        info = self.current_mem_info[i]
        feats = self.current_features[i]
        if 0 < len(info) < self.num_bbox_per_cls:
            deficit = self.num_bbox_per_cls - len(info)
            info.extend(info[:deficit])
            feats.extend(feats[:deficit])

    def rnd_sampling(self):
        for i in range(self.num_current_classes):
            random.shuffle(self.current_mem_info[i])
            self._pad_class(i)
            for j, entry in enumerate(self.current_mem_info[i][: self.num_bbox_per_cls]):
                self.create_and_save_box_image(entry, j)
        return sorted(os.listdir(self.current_mem_path))

    def mean_feature_sampling(self):
        for i in range(self.num_current_classes):
            self._pad_class(i)
            if not self.current_mem_info[i]:
                continue
            feats = np.asarray(self.current_features[i], dtype=np.float64)
            cls_mean = feats.mean(axis=0)
            cls_mean /= max(np.linalg.norm(cls_mean), 1e-12)
            phi = feats / max(np.linalg.norm(feats), 1e-12)  # global-norm, as reference
            dist = np.sqrt(((cls_mean - phi) ** 2).sum(axis=tuple(range(1, phi.ndim))))
            order = np.argsort(dist)[: self.num_bbox_per_cls]
            self.current_mem_info[i] = [self.current_mem_info[i][k] for k in order]
            for j, entry in enumerate(self.current_mem_info[i]):
                self.create_and_save_box_image(entry, j)
        return sorted(os.listdir(self.current_mem_path))

    def herding_feature_sampling(self):
        for i in range(self.num_current_classes):
            self._pad_class(i)
            if not self.current_mem_info[i]:
                continue
            feats = np.asarray(self.current_features[i], dtype=np.float64)
            n = feats.shape[0]
            flat = feats.reshape(n, -1)
            cls_mean = flat.mean(axis=0)
            cls_mean /= max(np.linalg.norm(cls_mean), 1e-12)

            current_center = np.zeros_like(cls_mean)
            selected: List[int] = []
            for f in range(n):
                candidates = current_center * f / (f + 1) + flat / (f + 1)
                distances = ((candidates - cls_mean) ** 2).sum(axis=1)
                distances[selected] = np.inf
                new_index = int(distances.argmin())
                selected.append(new_index)
                current_center = candidates[new_index]

            order = selected[: self.num_bbox_per_cls]
            self.current_mem_info[i] = [self.current_mem_info[i][k] for k in order]
            for j, entry in enumerate(self.current_mem_info[i]):
                self.create_and_save_box_image(entry, j)
        return sorted(os.listdir(self.current_mem_path))

    # ------------------------------------------------------------------
    def create_and_save_box_image(self, bbox_info: dict, ind: int):
        """Crop from the ORIGINAL JPEG and save as {cls}_{ind:05d}.jpg
        (extract_memory.py:220-236)."""
        from PIL import Image

        im = Image.open(self._imgpath % bbox_info["image_path"]).convert("RGB")
        b = bbox_info["box"]
        crop = im.crop((int(b[0]), int(b[1]), int(b[2]), int(b[3])))
        name = "{0}_{1:05d}.jpg".format(bbox_info["box_class"], ind)
        crop.save(os.path.join(self.current_mem_path, name))

    def update_memory(self, input_bboxes_info):
        """input_bboxes_info: per-new-class list of dicts with keys
        feature [7,7], logits, image_path, box_class, box."""
        if self.step == 0 and input_bboxes_info is None:
            return
        os.makedirs(self.current_mem_path, exist_ok=True)

        if self.step == 1 and self.first_mem_path:
            for file_name in self.exemplar:
                full = os.path.join(self.first_mem_path, file_name)
                _, index = os.path.splitext(file_name)[0].split("_")
                if os.path.isfile(full) and int(index) <= self.num_bbox_per_cls - 1:
                    shutil.copy(full, self.current_mem_path)
        elif self.step > 1:
            for file_name in self.exemplar:
                full = os.path.join(self.current_mem_path, file_name)
                _, index = os.path.splitext(file_name)[0].split("_")
                if os.path.isfile(full) and int(index) > self.num_bbox_per_cls - 1:
                    os.remove(full)

        self.current_mem_info = [list(c) for c in input_bboxes_info]
        self.current_features = [
            [np.asarray(e["feature"]) for e in c] for c in self.current_mem_info
        ]

        if self.mem_type == "random":
            self.exemplar = self.rnd_sampling()
        elif self.mem_type == "mean":
            self.exemplar = self.mean_feature_sampling()
        elif self.mem_type == "herding":
            self.exemplar = self.herding_feature_sampling()
        else:
            raise ValueError(f"unknown MEM_TYPE {self.mem_type!r}")
        return self.exemplar


def load_crop_bank(mem_path: str, bank_hw=(192, 192), max_crops: Optional[int] = None):
    """Decode the crop directory once into device-ready padded arrays for
    the on-device fusion (data/abr_fusion.CropBank).

    Content is resized (keeping aspect) to fit the bank slot; original
    pixel sizes are kept for the reference's rescale rule.
    """
    from PIL import Image

    from ..data.abr_fusion import CropBank
    import jax.numpy as jnp

    files = sorted(f for f in os.listdir(mem_path) if f.endswith(".jpg"))
    if max_crops:
        files = files[:max_crops]
    if not files:
        raise ValueError(f"no crops in {mem_path}")
    bh, bw = bank_hw
    n = len(files)
    pixels = np.zeros((n, bh, bw, 3), np.float32)
    content = np.zeros((n, 2), np.float32)
    orig = np.zeros((n, 2), np.float32)
    labels = np.zeros((n,), np.int32)
    for i, fname in enumerate(files):
        cls_name, _ = os.path.splitext(fname)[0].split("_")
        img = Image.open(os.path.join(mem_path, fname)).convert("RGB")
        ow, oh = img.size
        ratio = min(bh / oh, bw / ow, 1.0)
        nh, nw = max(1, int(oh * ratio)), max(1, int(ow * ratio))
        arr = np.asarray(img.resize((nw, nh), Image.BILINEAR), np.float32)
        pixels[i, :nh, :nw] = arr
        content[i] = (nh, nw)
        orig[i] = (oh, ow)
        labels[i] = int(cls_name)
    return CropBank(
        pixels=jnp.asarray(pixels),
        content_hw=jnp.asarray(content),
        orig_hw=jnp.asarray(orig),
        labels=jnp.asarray(labels),
    )
