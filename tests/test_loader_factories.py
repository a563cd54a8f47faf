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


def test_catalog_covers_reference_dataset_names():
    """The catalog resolves the dataset names the reference's configs and
    paths_catalog.py use (coco incremental + voc 2007/2012 instance)."""
    from abr_iod_tpu.config.catalog import DatasetCatalog

    for name in (
        "voc_2007_trainval", "voc_2007_test", "voc_rb_2007_trainval",
        "voc_2007_train", "voc_2007_val",
        "coco_2014_train", "coco_2014_minival", "coco_2014_valminusminival",
        "coco_2017_train", "coco_2017_val",
        "voc_2012_train_instance", "voc_2012_val_instance",
    ):
        spec = DatasetCatalog.get(name)
        assert "factory" in spec and "root" in spec, name


def test_make_data_source_dispatches_coco_and_instance(tmp_path, cfg):
    """Factory dispatch builds COCO / VOC2012-instance sources from
    catalog entries (reference data/build.py build_dataset)."""
    import json

    import numpy as np
    from PIL import Image

    from abr_iod_tpu.config.catalog import DatasetCatalog
    from abr_iod_tpu.engine.driver import make_data_source

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(img_dir / "x.jpg")
    def write_ann(path, names):
        ann = {
            "images": [{"id": 1, "file_name": "x.jpg", "height": 40,
                        "width": 60}],
            "annotations": [{
                "id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
                "bbox": [5, 5, 20, 20], "area": 400,
                "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]],
            }],
            "categories": [{"id": i + 1, "name": n}
                           for i, n in enumerate(names)],
        }
        path.write_text(json.dumps(ann))

    coco_ann = tmp_path / "coco.json"
    write_ann(coco_ann, ["person", "bicycle"])  # COCO category names
    inst_ann = tmp_path / "inst.json"
    write_ann(inst_ann, ["aeroplane", "bicycle"])  # VOC category names

    old = dict(DatasetCatalog.DATASETS)
    try:
        DatasetCatalog.DATASETS["tmp_coco"] = {
            "factory": "COCODataset", "data_dir": "",
            "img_dir": str(img_dir), "ann_file": str(coco_ann),
        }
        DatasetCatalog.DATASETS["tmp_inst"] = {
            "factory": "PascalVOCDataset2012", "data_dir": "",
            "img_dir": str(img_dir), "ann_file": str(inst_ann),
        }
        # catalog joins DATA_DIR; use absolute paths via empty DATA_DIR
        saved_dd = DatasetCatalog.DATA_DIR
        DatasetCatalog.DATA_DIR = ""
        cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES = ()
        cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = ("aeroplane", "bicycle")
        src = make_data_source(cfg, "tmp_coco", "train_new")
        assert len(src) == 1
        rec = src.annotation(0)
        assert rec["boxes"].shape == (1, 4)
        inst = make_data_source(cfg, "tmp_inst", "train_new")
        rec2 = inst.annotation(0)
        assert rec2["masks"].shape == (1, 40, 60)
        assert rec2["masks"][0, 10, 10]
    finally:
        DatasetCatalog.DATASETS = old
        DatasetCatalog.DATA_DIR = saved_dd


def test_paths_catalog_indirection(tmp_path, cfg):
    """cfg.PATHS_CATALOG points at a user catalog module; its DatasetCatalog
    resolves dataset names (reference data/build.py:145 import_file)."""
    import os

    cat = tmp_path / "my_catalog.py"
    root = tmp_path / "VOCx"
    cat.write_text(
        "class DatasetCatalog:\n"
        "    @staticmethod\n"
        "    def get(name):\n"
        f"        assert name == 'my_voc'\n"
        f"        return {{'root': {str(root)!r}, 'split': 'trainval',\n"
        "                'factory': 'PascalVOCDataset'}\n"
    )
    # minimal VOC tree so VOCDataSource can construct
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("")
    from abr_iod_tpu.config import VOC_CLASSES

    for c in VOC_CLASSES:
        (root / "ImageSets" / "Main" / f"{c}_trainval.txt").write_text("")

    from abr_iod_tpu.engine.driver import make_data_source

    cfg = cfg.clone()
    cfg.defrost() if hasattr(cfg, "defrost") else None
    cfg.PATHS_CATALOG = str(cat)
    src = make_data_source(cfg, "my_voc", "train_new")
    assert len(src) == 0  # empty split resolved through the custom catalog


def test_loader_worker_count_is_batch_invariant(cfg):
    """DATALOADER.NUM_WORKERS fans per-image prep over a thread pool; the
    produced batches must be bit-identical for any worker count (item
    RNGs are keyed by (seed, iter, global position), executor.map
    preserves order)."""
    cfg2 = cfg.clone()
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg2.DATALOADER.NUM_WORKERS = 4
    # jitter + flip + multi-scale ON so the rng streams actually matter
    for c in (cfg, cfg2):
        c.INPUT.BRIGHTNESS = 0.3
        c.INPUT.CONTRAST = 0.3
        c.INPUT.MIN_SIZE_TRAIN = (80, 96)
    a = list(make_data_loader(cfg, is_train=True).batches(max_batches=3))
    b = list(make_data_loader(cfg2, is_train=True).batches(max_batches=3))
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.pixels, bb.pixels)
        np.testing.assert_array_equal(ba.gt_boxes, bb.gt_boxes)
        np.testing.assert_array_equal(ba.gt_labels, bb.gt_labels)
        np.testing.assert_array_equal(ba.gt_mask, bb.gt_mask)


def test_canvas_cache_budget_clamps_to_available_ram():
    """TPU.CANVAS_CACHE_MB defaults to 20 GB; on smaller hosts the loader
    must clamp the host-RSS LRU to a fraction of available RAM instead of
    growing until the OOM killer fires (advisor r4 medium)."""
    from abr_iod_tpu.data.loader import clamp_cache_budget_mb, _available_ram_mb

    avail = _available_ram_mb()
    assert avail is not None and avail > 0
    assert clamp_cache_budget_mb(avail * 10) <= avail * 0.5 + 1
    assert clamp_cache_budget_mb(1.0) == 1.0  # small budgets untouched
