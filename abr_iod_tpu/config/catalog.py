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
    }

    @classmethod
    def get(cls, name: str):
        if name not in cls.DATASETS:
            raise KeyError(f"unknown dataset {name!r}")
        spec = dict(cls.DATASETS[name])
        spec["root"] = os.path.join(cls.DATA_DIR, spec.pop("data_dir"))
        return spec
