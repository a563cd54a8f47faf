import os

import numpy as np
import pytest

from abr_iod_tpu.config import get_default_config, VOC_CLASSES
from abr_iod_tpu.data.synthetic import make_synthetic_voc
from abr_iod_tpu.data.voc import VOCDataSource
from abr_iod_tpu.data.loader import DetectionLoader
from abr_iod_tpu.data import transforms as T
from abr_iod_tpu.evaluation.voc_eval import eval_detection_voc


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc") / "VOC2007")
    make_synthetic_voc(root, n_images=12, classes=VOC_CLASSES[:6], image_hw=(120, 160))
    return root


def test_voc_source_modes(voc_root):
    new = VOC_CLASSES[:4]
    old = ()
    src = VOCDataSource(voc_root, "trainval", "train_new", old, new, ())
    assert len(src) > 0
    rec = src.annotation(0)
    assert rec["boxes"].shape[1] == 4
    assert (rec["labels"] >= 1).all()
    # only classes 1..4 appear (others not excluded → kept only if new?)
    # train_new keeps everything except old/excluded; classes 5,6 may appear
    img = src.load_image(0)
    assert img.shape == (120, 160, 3)


def test_voc_source_old_class_filtering(voc_root):
    old, new = VOC_CLASSES[:2], VOC_CLASSES[2:4]
    src = VOCDataSource(voc_root, "trainval", "train_new", old, new, ())
    for i in range(len(src)):
        labels = src.annotation(i)["labels"]
        assert not np.isin(labels, [1, 2]).any()  # old classes dropped in train
    src_test = VOCDataSource(voc_root, "test", "test_all", old, new, ())
    found_old = any(
        np.isin(src_test.annotation(i)["labels"], [1, 2]).any()
        for i in range(len(src_test))
    )
    assert found_old  # test keeps old-class GTs


def test_voc_excluded_class_filtering(voc_root):
    excluded = (VOC_CLASSES[5],)
    src = VOCDataSource(voc_root, "test", "test_all", (), VOC_CLASSES[:5], excluded)
    for i in range(len(src)):
        labels = src.annotation(i)["labels"]
        assert not (labels == 6).any()


def test_resize_and_flip_roundtrip():
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]])
    canvas, (nh, nw), scaled = T.resize_to_canvas(img, boxes, 800, 1333, (832, 1344))
    # ratio capped by canvas: 832/100=8.32 → but shortest-side rule: 800/100=8, long 200*8=1600>1333 → 1333/200=6.665
    assert abs(nw - 1333) <= 1
    np.testing.assert_allclose(scaled[0, 0], 10 * nw / 200, rtol=1e-5)
    flipped_img, flipped = T.hflip(canvas, (nh, nw), scaled)
    np.testing.assert_allclose(flipped[0, 2], nw - scaled[0, 0] - 1, rtol=1e-5)


def test_loader_batches(voc_root):
    cfg = get_default_config()
    cfg.TPU.CANVAS_TRAIN = (128, 160)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.TPU.MAX_GT = 8
    src = VOCDataSource(voc_root, "trainval", "train_new", (), VOC_CLASSES[:6], ())
    loader = DetectionLoader(src, cfg, batch_size=4, is_train=True)
    batches = list(loader.prefetched(max_batches=3))
    assert len(batches) == 3
    b = batches[0]
    assert b.pixels.shape == (4, 128, 160, 3)
    assert b.gt_boxes.shape == (4, 8, 4)
    assert b.gt_mask.any()
    # boxes inside valid region
    for i in range(4):
        h, w = b.sizes[i]
        bx = b.gt_boxes[i][b.gt_mask[i]]
        assert (bx[:, 2] <= w + 1e-3).all() and (bx[:, 3] <= h + 1e-3).all()


def test_canvas_cache_bit_identical(voc_root):
    """The resized-canvas LRU (TPU.CANVAS_CACHE_MB) must be output-
    invariant: multi-epoch train batches with the cache enabled are
    byte-equal to a cache-disabled run, in every normalize mode, with
    flip + multi-scale draws active (the rng stream is untouched)."""
    cfg = get_default_config()
    cfg.TPU.CANVAS_TRAIN = (128, 160)
    cfg.INPUT.MIN_SIZE_TRAIN = (96, 112)  # multi-scale draw exercised
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.TPU.MAX_GT = 8
    src = VOCDataSource(voc_root, "trainval", "train_new", (), VOC_CLASSES[:6], ())

    def run(cache_mb, normalize):
        c = cfg.clone()
        c.TPU.CANVAS_CACHE_MB = cache_mb
        loader = DetectionLoader(src, c, batch_size=4, is_train=True,
                                 normalize=normalize, seed=3)
        # 12 images / batch 4 → 9 batches spans 3 epochs: epochs 2-3 hit
        batches = list(loader.batches(max_batches=9))
        return loader, batches

    for normalize in (True, "device"):
        l0, base = run(0, normalize)
        l1, cached = run(64, normalize)
        assert l0._cache_budget == 0 and l1._cache_budget > 0
        assert len(l1._cache) > 0  # the cache actually populated
        for a, b in zip(base, cached):
            np.testing.assert_array_equal(a.pixels, b.pixels)
            np.testing.assert_array_equal(a.sizes, b.sizes)
            np.testing.assert_array_equal(a.gt_boxes, b.gt_boxes)
            np.testing.assert_array_equal(a.gt_labels, b.gt_labels)
            np.testing.assert_array_equal(a.gt_mask, b.gt_mask)

    # an LRU budget smaller than the dataset evicts instead of growing
    c = cfg.clone()
    c.TPU.CANVAS_CACHE_MB = 0.2  # ~3 canvases of 128x160x3
    loader = DetectionLoader(src, c, batch_size=4, is_train=True,
                             normalize="device", seed=3)
    small = list(loader.batches(max_batches=9))
    assert loader._cache_bytes <= loader._cache_budget
    for a, b in zip(base, small):
        np.testing.assert_array_equal(
            np.asarray(a.pixels, np.uint8), b.pixels)

    # active color jitter disables the cache (output would not be
    # deterministic per image)
    cj = cfg.clone()
    cj.INPUT.BRIGHTNESS = 0.4
    loader = DetectionLoader(src, cj, batch_size=4, is_train=True)
    assert loader._cache_budget == 0


def test_loader_resume_fast_forwards_stream(voc_root):
    """A resumed loader must continue the index stream where the checkpoint
    left off, not re-consume the first start_iter batches (reference
    IterationBasedBatchSampler skips to start_iter)."""
    cfg = get_default_config()
    cfg.TPU.CANVAS_TRAIN = (128, 160)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.TPU.MAX_GT = 8
    src = VOCDataSource(voc_root, "trainval", "train_new", (), VOC_CLASSES[:6], ())

    fresh = DetectionLoader(src, cfg, batch_size=4, is_train=True, seed=3)
    seq = [b for _, b in zip(range(5), fresh._index_batches())]

    resumed = DetectionLoader(src, cfg, batch_size=4, is_train=True, seed=3)
    resumed.start_iter = 2  # as engine/driver.py sets it after restore
    tail = [b for _, b in zip(range(3), resumed._index_batches())]
    assert [list(b) for b in tail] == [list(b) for b in seq[2:]]


def test_eval_map_perfect_predictions():
    gt = [
        {
            "boxes": np.array([[10.0, 10, 50, 50], [60, 60, 100, 100]]),
            "labels": np.array([1, 2]),
            "difficult": np.array([False, False]),
        }
    ]
    pred = [
        {
            "boxes": np.array([[10.0, 10, 50, 50], [60, 60, 100, 100]]),
            "labels": np.array([1, 2]),
            "scores": np.array([0.9, 0.8]),
        }
    ]
    res = eval_detection_voc(pred, gt)
    assert res["map"] == pytest.approx(1.0)


def test_eval_map_false_positive_and_difficult():
    gt = [
        {
            "boxes": np.array([[10.0, 10, 50, 50], [60, 60, 100, 100]]),
            "labels": np.array([1, 1]),
            "difficult": np.array([False, True]),
        }
    ]
    # one TP, one FP (bad box), one match to difficult gt (ignored)
    pred = [
        {
            "boxes": np.array(
                [[10.0, 10, 50, 50], [200, 200, 240, 240], [60, 60, 100, 100]]
            ),
            "labels": np.array([1, 1, 1]),
            "scores": np.array([0.9, 0.8, 0.7]),
        }
    ]
    res = eval_detection_voc(pred, gt)
    # n_pos=1, tp=1 at rank1; fp at rank2; difficult match ignored
    # AP = area under PR: rec hits 1.0 at prec 1.0 → AP=1.0
    assert res["ap"][1] == pytest.approx(1.0)


def test_eval_map_missed_gt():
    gt = [
        {
            "boxes": np.array([[10.0, 10, 50, 50], [60, 60, 100, 100]]),
            "labels": np.array([1, 1]),
            "difficult": np.array([False, False]),
        }
    ]
    pred = [
        {
            "boxes": np.array([[10.0, 10, 50, 50]]),
            "labels": np.array([1]),
            "scores": np.array([0.9]),
        }
    ]
    res = eval_detection_voc(pred, gt)
    assert res["ap"][1] == pytest.approx(0.5)


def test_concat_data_source(voc_root):
    from abr_iod_tpu.data.concat import ConcatDataSource

    new = VOC_CLASSES[:4]
    a = VOCDataSource(voc_root, "trainval", "train_new", (), new, ())
    b = VOCDataSource(voc_root, "test", "test_all", (), new, ())
    c = ConcatDataSource([a, b])
    assert len(c) == len(a) + len(b)
    rec_a = c.annotation(0)
    rec_b = c.annotation(len(a))
    assert rec_a["img_id"] == a.annotation(0)["img_id"]
    assert rec_b["img_id"] == b.annotation(0)["img_id"]
    assert c.load_image(len(a)).shape[2] == 3


def test_device_normalize_matches_host_normalize(voc_root):
    """normalize="device" ships uint8 canvases and normalizes on device;
    the result must be bit-identical to the host transforms.normalize
    path (same f32 arithmetic on the same uint8-exact resize output)."""
    import jax.numpy as jnp

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.data.transforms import make_device_normalize

    cfg = get_default_config()
    cfg.TPU.CANVAS_TRAIN = (128, 160)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.BRIGHTNESS = 0.2  # exercise the jitter path too
    cfg.TPU.MAX_GT = 8
    src = VOCDataSource(voc_root, "trainval", "train_new", (),
                        VOC_CLASSES[:6], ())
    host = DetectionLoader(src, cfg, batch_size=2, is_train=True, seed=7)
    dev = DetectionLoader(src, cfg, batch_size=2, is_train=True, seed=7,
                          normalize="device")
    norm = make_device_normalize(cfg.INPUT.PIXEL_MEAN,
                                 bool(cfg.INPUT.TO_BGR255))
    for bh, bd in zip(host.batches(max_batches=2), dev.batches(max_batches=2)):
        assert bd.pixels.dtype == np.uint8
        np.testing.assert_array_equal(
            bh.pixels, np.asarray(norm(jnp.asarray(bd.pixels)))
        )
        np.testing.assert_array_equal(bh.gt_boxes, bd.gt_boxes)


def test_empty_train_source_raises(voc_root):
    """An empty train stream must fail loudly: _indices() cycles epochs
    forever for is_train, so a zero-image source (wrong class lists or
    dataset name) would otherwise hang the CLI after the bank banner."""
    # an imageset with no positive entries -> 0 matching images
    cls = VOC_CLASSES[8]
    for split in ("trainval", "test"):
        with open(os.path.join(voc_root, "ImageSets", "Main",
                               f"{cls}_{split}.txt"), "w") as f:
            f.write("000001 -1\n")
    src = VOCDataSource(voc_root, "trainval", "train_new", (), (cls,), ())
    assert len(src) == 0
    cfg = get_default_config()
    with pytest.raises(ValueError, match="empty training dataset"):
        DetectionLoader(src, cfg, batch_size=2, is_train=True)
    # eval visits each image exactly once, so empty eval just yields nothing
    loader = DetectionLoader(src, cfg, batch_size=2, is_train=False)
    assert list(loader.batches()) == []
