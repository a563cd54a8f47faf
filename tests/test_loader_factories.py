"""make_data_loader / make_bbox_loader factory surface (reference
data/build.py parity)."""

import os

import numpy as np
import pytest

from abr_iod_tpu.config import get_default_config, VOC_CLASSES
from abr_iod_tpu.data.build import make_bbox_loader, make_data_loader
from abr_iod_tpu.data.synthetic import make_synthetic_voc


@pytest.fixture()
def cfg(tmp_path, monkeypatch):
    from abr_iod_tpu.config.catalog import DatasetCatalog

    monkeypatch.setattr(DatasetCatalog, "DATA_DIR", str(tmp_path / "datasets"))
    root = str(tmp_path / "datasets" / "synthetic_voc" / "VOC2007")
    make_synthetic_voc(root, n_images=6, classes=VOC_CLASSES[:4], image_hw=(120, 160))

    cfg = get_default_config()
    cfg.DATASETS.TRAIN = ("voc_rb_synthetic_train",)
    cfg.DATASETS.TEST = ("voc_synthetic_test",)
    cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = VOC_CLASSES[:4]
    cfg.TPU.CANVAS_TRAIN = (128, 160)
    cfg.TPU.CANVAS_TEST = (128, 160)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.TPU.MAX_GT = 8
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TEST.IMS_PER_BATCH = 2
    return cfg


def test_make_data_loader_train(cfg):
    loader = make_data_loader(cfg, is_train=True)
    batch = next(iter(loader.batches(max_batches=1)))
    assert batch.pixels.shape == (2, 128, 160, 3)
    assert batch.gt_mask.any()


def test_make_data_loader_eval(cfg):
    loader = make_data_loader(cfg, is_train=False)
    batch, records, n_valid = next(iter(loader.eval_batches()))
    assert n_valid >= 1
    assert records[0]["boxes"].shape[1] == 4


def test_make_bbox_loader_sampling_mode(cfg):
    loader = make_bbox_loader(cfg)
    assert len(loader) > 0
    batch, records, n_valid = next(iter(loader.eval_batches()))
    # sampling mode: only new-class labels present
    for rec in records:
        assert np.isin(rec["labels"], [1, 2, 3, 4]).all()
