"""Dataset catalog (reference: maskrcnn_benchmark/config/paths_catalog.py).

Maps dataset names (e.g. ``voc_2007_trainval``, ``voc_rb_2007_trainval``)
to factories + arguments.  The ``voc_rb_*`` variants select the
box-rehearsal (ABR) dataset, mirroring paths_catalog.py:101-173.

Model weights: the reference resolves ``catalog://ImageNetPretrained``
to Detectron S3 URLs (paths_catalog.py:210-268); this environment has no
egress, so remote catalog entries resolve to local files under
``ABR_IOD_WEIGHTS_DIR`` when present and otherwise fall back to random
init with a logged warning.
"""

from __future__ import annotations

import os

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class DatasetCatalog:
    DATA_DIR = os.environ.get("ABR_IOD_DATA_DIR", "datasets")

    DATASETS = {
        "voc_2007_trainval": {
            "factory": "PascalVOCDataset",
            "data_dir": "voc/VOC2007",
            "split": "trainval",
        },
        "voc_2007_test": {
            "factory": "PascalVOCDataset",
            "data_dir": "voc/VOC2007",
            "split": "test",
        },
        "voc_rb_2007_trainval": {
            "factory": "PascalVOCDatasetABR",
            "data_dir": "voc/VOC2007",
            "split": "trainval",
        },
        "voc_2007_train": {
            "factory": "PascalVOCDataset",
            "data_dir": "voc/VOC2007",
            "split": "train",
        },
        "voc_2007_val": {
            "factory": "PascalVOCDataset",
            "data_dir": "voc/VOC2007",
            "split": "val",
        },
        # COCO-json datasets (reference paths_catalog.py:10-49; the COCO
        # incremental protocol uses 2014 train/minival)
        "coco_2017_train": {
            "factory": "COCODataset",
            "data_dir": "coco",
            "img_dir": "coco/train2017",
            "ann_file": "coco/annotations/instances_train2017.json",
        },
        "coco_2017_val": {
            "factory": "COCODataset",
            "data_dir": "coco",
            "img_dir": "coco/val2017",
            "ann_file": "coco/annotations/instances_val2017.json",
        },
        "coco_2014_train": {
            "factory": "COCODataset",
            "data_dir": "COCO2014",
            "img_dir": "COCO2014/train2014",
            "ann_file": "COCO2014/annotations/instances_train2014.json",
        },
        "coco_2014_val": {
            "factory": "COCODataset",
            "data_dir": "COCO2014",
            "img_dir": "COCO2014/val2014",
            "ann_file": "COCO2014/annotations/instances_val2014.json",
        },
        "coco_2014_minival": {
            "factory": "COCODataset",
            "data_dir": "COCO2014",
            "img_dir": "COCO2014/val2014",
            "ann_file": "COCO2014/annotations/instances_minival2014.json",
        },
        "coco_2014_valminusminival": {
            "factory": "COCODataset",
            "data_dir": "COCO2014",
            "img_dir": "COCO2014/val2014",
            "ann_file": "COCO2014/annotations/instances_valminusminival2014.json",
        },
        # VOC2012/SBD instance segmentation (reference voc2012_Instance.py)
        "voc_2012_train_instance": {
            "factory": "PascalVOCDataset2012",
            "data_dir": "voc12",
            "img_dir": "voc12/img",
            "ann_file": "voc12/voc_2012_train_instance.json",
        },
        "voc_2012_val_instance": {
            "factory": "PascalVOCDataset2012",
            "data_dir": "voc12",
            "img_dir": "voc12/img",
            "ann_file": "voc12/voc_2012_val_instance.json",
        },
        # synthetic datasets for tests / benches (no VOC on disk needed)
        "voc_synthetic_train": {
            "factory": "SyntheticVOCDataset",
            "data_dir": "",
            "split": "train",
        },
        "voc_synthetic_test": {
            "factory": "SyntheticVOCDataset",
            "data_dir": "",
            "split": "test",
        },
        "voc_rb_synthetic_train": {
            "factory": "SyntheticVOCDatasetABR",
            "data_dir": "",
            "split": "train",
        },
        # synthetic COCO-json sets: instance masks (mask family CLI) and
        # person keypoints (keypoint family CLI); generated on first use
        "instseg_synthetic_train": {
            "factory": "SyntheticInstSegDataset",
            "data_dir": "synthetic_instseg",
            "split": "train",
        },
        "instseg_synthetic_test": {
            "factory": "SyntheticInstSegDataset",
            "data_dir": "synthetic_instseg",
            "split": "test",
        },
        "keypoints_synthetic_train": {
            "factory": "SyntheticKeypointDataset",
            "data_dir": "synthetic_keypoints",
            "split": "train",
        },
        "keypoints_synthetic_test": {
            "factory": "SyntheticKeypointDataset",
            "data_dir": "synthetic_keypoints",
            "split": "test",
        },
    }

    @classmethod
    def get(cls, name: str):
        if name not in cls.DATASETS:
            raise KeyError(f"unknown dataset {name!r}")
        spec = dict(cls.DATASETS[name])
        spec["root"] = os.path.join(cls.DATA_DIR, spec.pop("data_dir"))
        for key in ("img_dir", "ann_file"):
            if key in spec:
                spec[key] = os.path.join(cls.DATA_DIR, spec[key])
        return spec
