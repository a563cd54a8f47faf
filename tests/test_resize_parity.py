"""Input-resize parity with the reference's exact integer semantics.

The reference computes target sizes in integers (transforms.py:73-93
get_size): the max_size-capped shortest side via int(round(.)) and the
long side via int(truncation); boxes then scale by the PER-AXIS ratios of
the final integer sizes (bounding_box.py:62-76 resize).  A float-ratio
implementation that rounds both sides drifts by one pixel on fractional
cases — these tests pin the exact rule across the real VOC shape range,
plus the canvas-fit behavior and per-axis box scaling of
resize_to_canvas.
"""

import numpy as np

from abr_iod_tpu.data import transforms as T


def _get_size_reference(w, h, size, max_size):
    """Independent restatement of transforms.py:73-93 (PIL (w,h) order)."""
    if max_size is not None:
        min_original_size = float(min((w, h)))
        max_original_size = float(max((w, h)))
        if max_original_size / min_original_size * size > max_size:
            size = int(round(max_size * min_original_size / max_original_size))
    if (w <= h and w == size) or (h <= w and h == size):
        return (h, w)
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return (oh, ow)


def test_resize_hw_matches_reference_get_size_exhaustively():
    rng = np.random.RandomState(7)
    cases = [(375, 500), (500, 375), (333, 500), (500, 333), (347, 461),
             (750, 500), (480, 640), (1, 1000), (1000, 1), (800, 800),
             (100, 1000), (1000, 100), (799, 1200), (801, 801)]
    cases += [tuple(rng.randint(50, 1200, 2)) for _ in range(200)]
    for h, w in cases:
        want = _get_size_reference(w, h, 800, 1333)
        got = T.reference_resize_hw(h, w, 800, 1333)
        assert got == want, (h, w, got, want)


def test_known_fractional_case_uses_truncation():
    # 500x375 landscape: oh=800, ow=int(800*500/375)=1066 — NOT 1067
    assert T.reference_resize_hw(375, 500, 800, 1333) == (800, 1066)
    # capped case: 375x1242 → size=int(round(1333*375/1242))=402,
    # ow=int(402*1242/375)=1331 — ratio-rounding would give (403, 1333)
    assert T.reference_resize_hw(375, 1242, 800, 1333) == (402, 1331)


def test_resize_to_canvas_uses_reference_sizes_and_per_axis_box_scale():
    img = np.zeros((375, 500, 3), np.uint8)
    boxes = np.asarray([[10.0, 20.0, 400.0, 300.0]], np.float32)
    canvas, (nh, nw), scaled = T.resize_to_canvas(
        img, boxes, 800, 1333, (832, 1344))
    assert (nh, nw) == (800, 1066)
    assert canvas.shape == (832, 1344, 3)
    # boxes scale by the final integer per-axis ratios (BoxList.resize)
    np.testing.assert_allclose(scaled[0, 0::2], boxes[0, 0::2] * (1066 / 500))
    np.testing.assert_allclose(scaled[0, 1::2], boxes[0, 1::2] * (800 / 375))


def test_resize_to_canvas_shrinks_to_fit_tiny_canvas():
    # shrunken test canvases (96x128) still fit, preserving aspect
    img = np.zeros((240, 320, 3), np.uint8)
    _, (nh, nw), _ = T.resize_to_canvas(
        img, np.zeros((0, 4), np.float32), 96, 128, (96, 128))
    assert nh <= 96 and nw <= 128 and (nh, nw) == (96, 128)


def test_multiscale_min_size_train_samples_per_image(tmp_path):
    """MIN_SIZE_TRAIN with several entries picks one PER IMAGE (reference
    transforms.py:75 random.choice) — multi-scale training jitters the
    resized shortest side across the batch stream."""
    from abr_iod_tpu.config import get_default_config, VOC_CLASSES
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.data.synthetic import make_synthetic_voc
    from abr_iod_tpu.data.voc import VOCDataSource

    root = str(tmp_path / "VOC2007")
    make_synthetic_voc(root, n_images=10, classes=VOC_CLASSES[:6],
                       image_hw=(120, 160))
    cfg = get_default_config()
    cfg.TPU.CANVAS_TRAIN = (128, 172)
    cfg.INPUT.MIN_SIZE_TRAIN = (64, 96, 128)
    cfg.INPUT.MAX_SIZE_TRAIN = 172
    cfg.TPU.MAX_GT = 8
    src = VOCDataSource(root, "trainval", "train_new", (), VOC_CLASSES[:6], ())
    loader = DetectionLoader(src, cfg, batch_size=2, is_train=True)
    shorts = set()
    for b in loader.prefetched(max_batches=6):
        for i in range(2):
            shorts.add(int(min(b.sizes[i])))
    # 120x160 inputs at min sizes 64/96/128 -> shortest sides 64/96/120
    assert len(shorts) >= 2, shorts
