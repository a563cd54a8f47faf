"""Mask/keypoint branches wired into the compiled train step
(reference roi_heads/roi_heads.py:23-63: box + mask + keypoint losses in
one training forward)."""

import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.engine import Batch, TrainState, make_train_step
from abr_iod_tpu.solver.optim import make_optimizer
from abr_iod_tpu.structures.masks import resample_gt_crops_to_rois
import pytest
from tests.test_train_step import CANVAS, tiny_cfg, tiny_model, synth_batch

pytestmark = pytest.mark.slow  # compile-heavy tier: run with `pytest -m ""`


def test_resample_identity_and_offset():
    """roi == gt box → the target IS the crop; roi == right half of the
    gt box → the target is the crop's right half."""
    r = 8
    crop = np.zeros((r, r), np.float32)
    crop[:, r // 2 :] = 1.0  # right half on
    gt_boxes = np.array([[10.0, 10.0, 26.0, 26.0]], np.float32)
    rois = np.array([[10.0, 10.0, 26.0, 26.0], [18.0, 10.0, 26.0, 26.0]],
                    np.float32)
    matched = np.array([0, 0], np.int32)
    out = np.asarray(
        resample_gt_crops_to_rois(
            jnp.asarray(crop[None]), jnp.asarray(gt_boxes),
            jnp.asarray(matched), jnp.asarray(rois), r,
        )
    )
    np.testing.assert_allclose(out[0], crop, atol=1e-5)  # identity
    assert (out[1] > 0.5).mean() > 0.9  # right-half roi sees mostly mask


def _mask_batch(rng, b=2, max_gt=8, crop_r=16):
    batch = synth_batch(rng, b=b, max_gt=max_gt)
    crops = np.zeros((b, max_gt, crop_r, crop_r), np.float32)
    # each gt instance: an ellipse-ish blob inside its box
    yy, xx = np.mgrid[0:crop_r, 0:crop_r]
    blob = (((yy - crop_r / 2) ** 2 + (xx - crop_r / 2) ** 2)
            < (crop_r / 3) ** 2).astype(np.float32)
    crops[:, :] = blob
    return batch._replace(gt_mask_crops=jnp.asarray(crops))


def test_mask_loss_in_train_step(rng):
    cfg = tiny_cfg()
    cfg.MODEL.MASK_ON = True
    from abr_iod_tpu.models import FasterRCNN

    model = FasterRCNN(
        num_classes=4, num_anchors=3, mask_on=True,
        backbone_stages=(1, 1, 1), width_per_group=8,
        res2_out_channels=16, res5_blocks=1, res5_bottleneck=16, res5_out=32,
    )
    batch = _mask_batch(rng)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch.pixels[:1], jnp.zeros((1, 4, 4)) + 16.0
    )
    tx = make_optimizer(cfg, params)
    step, _ = make_train_step(model, tx, cfg, CANVAS)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, metrics = step(state, batch)
    assert "loss_mask" in metrics
    assert np.isfinite(float(metrics["loss_mask"]))
    assert float(metrics["loss_mask"]) > 0.0
    # total includes the mask term
    parts = (metrics["loss_objectness"] + metrics["loss_rpn_box_reg"]
             + metrics["loss_classifier"] + metrics["loss_box_reg"]
             + metrics["loss_mask"])
    np.testing.assert_allclose(float(metrics["loss"]), float(parts), rtol=1e-5)


def test_keypoint_loss_in_train_step(rng):
    cfg = tiny_cfg()
    cfg.MODEL.KEYPOINT_ON = True
    from abr_iod_tpu.models import FasterRCNN

    model = FasterRCNN(
        num_classes=4, num_anchors=3, keypoint_on=True,
        backbone_stages=(1, 1, 1), width_per_group=8,
        res2_out_channels=16, res5_blocks=1, res5_bottleneck=16, res5_out=32,
    )
    batch = synth_batch(rng, b=2)
    k = 17
    kps = np.zeros((2, 8, k, 3), np.float32)
    # visible keypoints at each gt box center
    centers = (np.asarray(batch.gt_boxes[..., :2])
               + np.asarray(batch.gt_boxes[..., 2:])) / 2
    kps[..., 0] = centers[..., 0:1]
    kps[..., 1] = centers[..., 1:2]
    kps[..., 2] = np.asarray(batch.gt_mask)[..., None]
    batch = batch._replace(gt_keypoints=jnp.asarray(kps))

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch.pixels[:1], jnp.zeros((1, 4, 4)) + 16.0
    )
    tx = make_optimizer(cfg, params)
    step, _ = make_train_step(model, tx, cfg, CANVAS)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state, metrics = step(state, batch)
    assert "loss_kp" in metrics
    assert np.isfinite(float(metrics["loss_kp"]))


def test_loader_emits_mask_crops(tmp_path):
    """MASK_ON + an instance-mask dataset → batches carry gt_mask_crops."""
    from abr_iod_tpu.config import get_default_config, VOC_CLASSES
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.data.synthetic import make_synthetic_voc
    from abr_iod_tpu.data.voc import VOCDataSource

    root = str(tmp_path / "VOC2007")
    make_synthetic_voc(root, n_images=4, classes=VOC_CLASSES[:4],
                       image_hw=(120, 160))
    cfg = get_default_config()
    cfg.MODEL.MASK_ON = True
    cfg.TPU.CANVAS_TRAIN = (96, 128)
    cfg.TPU.MASK_CROP_SIZE = 16
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.TPU.MAX_GT = 8

    class MaskedSource(VOCDataSource):
        """Synthetic instance masks: the full gt box region."""

        def annotation(self, index):
            rec = super().annotation(index)
            masks = np.zeros((len(rec["boxes"]), rec["height"], rec["width"]),
                             bool)
            for i, (x1, y1, x2, y2) in enumerate(rec["boxes"].astype(int)):
                masks[i, y1 : y2 + 1, x1 : x2 + 1] = True
            rec["masks"] = masks
            return rec

    src = MaskedSource(root, "trainval", "train_new", (), VOC_CLASSES[:4], ())
    loader = DetectionLoader(src, cfg, batch_size=2, is_train=True)
    b = next(iter(loader.batches(max_batches=1)))
    assert b.gt_mask_crops is not None
    assert b.gt_mask_crops.shape == (2, 8, 16, 16)
    # box-filling masks → crops are (almost) all ones for real instances
    real = np.asarray(b.gt_mask)[0]
    if real.any():
        first = np.asarray(b.gt_mask_crops)[0][real.argmax()]
        assert first.mean() > 0.8


def test_mask_eval_step_and_instance_map(rng, tmp_path):
    """MASK_ON eval: the eval step returns (detections, mask probs); the
    driver pastes masks back and reports instance-seg mAP
    (reference roi_heads.py:45-63 + voc_eval_inst)."""
    import json

    from PIL import Image

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.config.catalog import DatasetCatalog
    from abr_iod_tpu.engine.driver import run_test
    from abr_iod_tpu.models import FasterRCNN
    from abr_iod_tpu.utils.checkpoint import Checkpointer

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    images, annotations = [], []
    r = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(r.randint(0, 255, (96, 128, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        images.append({"id": i, "file_name": f"{i}.jpg", "height": 96,
                       "width": 128})
        annotations.append({
            "id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
            "bbox": [10, 10, 40, 50], "area": 2000,
            "segmentation": [[10, 10, 50, 10, 50, 60, 10, 60]],
        })
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "aeroplane"},
                       {"id": 2, "name": "bicycle"}],
    }))

    cfg = get_default_config()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES = ()
    cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = ("aeroplane", "bicycle")
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64)
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1)
    cfg.TPU.RES5_BLOCKS = 1
    cfg.TPU.RES5_BOTTLENECK = 16
    cfg.TPU.RES5_OUT = 32
    cfg.TPU.CANVAS_TEST = (96, 128)
    cfg.TPU.CANVAS_TRAIN = (96, 128)
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.MAX_GT = 8
    cfg.TPU.PRE_NMS_TOP_N_TEST = 64
    cfg.TPU.POST_NMS_TOP_N_TEST = 32
    cfg.TPU.EVAL_NMS_PER_CLASS_TOPK = 8
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.DATASETS.TEST = ("tmp_mask_eval",)
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    # a checkpoint for run_test to pick up
    model = FasterRCNN(
        num_classes=3, num_anchors=3, mask_on=True,
        backbone_stages=(1, 1, 1), width_per_group=8,
        res2_out_channels=16, res5_blocks=1, res5_bottleneck=16, res5_out=32,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3)),
        jnp.zeros((1, 4, 4)) + 16.0,
    )
    Checkpointer(cfg.OUTPUT_DIR).save("model_last", {
        "params": jax.device_get(params)["params"], "iteration": 0})

    old = dict(DatasetCatalog.DATASETS)
    saved_dd = DatasetCatalog.DATA_DIR
    try:
        DatasetCatalog.DATASETS["tmp_mask_eval"] = {
            "factory": "PascalVOCDataset2012", "data_dir": "",
            "img_dir": str(img_dir), "ann_file": str(ann),
        }
        DatasetCatalog.DATA_DIR = ""
        result = run_test(cfg, params=params)
    finally:
        DatasetCatalog.DATASETS = old
        DatasetCatalog.DATA_DIR = saved_dd

    assert "segm" in result
    assert np.isfinite(result["segm"]["map"]) or np.isnan(result["segm"]["map"])


def test_keypoint_eval_decodes_keypoints(rng):
    """KEYPOINT_ON eval step returns decoded (x, y, score) keypoints for
    the final detections (reference keypoint_head/inference.py)."""
    import jax

    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.engine.inference import make_eval_step
    from abr_iod_tpu.models import FasterRCNN

    cfg = get_default_config()
    cfg.MODEL.KEYPOINT_ON = True
    cfg.TPU.PRE_NMS_TOP_N_TEST = 64
    cfg.TPU.POST_NMS_TOP_N_TEST = 32
    cfg.TPU.EVAL_NMS_PER_CLASS_TOPK = 8
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 10
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64)
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)

    model = FasterRCNN(
        num_classes=3, num_anchors=3, keypoint_on=True,
        backbone_stages=(1, 1, 1), width_per_group=8,
        res2_out_channels=16, res5_blocks=1, res5_bottleneck=16, res5_out=32,
    )
    canvas = (64, 96)
    pixels = jnp.asarray(rng.randn(1, *canvas, 3).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), pixels, jnp.zeros((1, 4, 4)) + 16.0
    )
    eval_step, _ = make_eval_step(model, cfg, canvas)
    dets, kp_maps = eval_step(
        params, pixels, jnp.asarray(np.array([[64, 96]], np.int32))
    )
    # eval step returns RAW per-detection heatmaps; the host decodes with
    # the reference's exact cv2 upsample + sub-bin argmax
    assert kp_maps.shape[:2] == dets.boxes.shape[:2]
    v = np.asarray(dets.valid[0])
    if v.any():
        from abr_iod_tpu.models.keypoint_head import heatmaps_to_keypoints_np

        b = np.asarray(dets.boxes[0])[v]
        k = heatmaps_to_keypoints_np(np.asarray(kp_maps[0])[v], b)
        assert k.shape[-1] == 3  # (x, y, logit)
        # decoded keypoints land inside their detection boxes
        assert (k[..., 0] >= b[:, None, 0] - 1).all()
        assert (k[..., 0] <= b[:, None, 2] + 1).all()


def test_positive_compaction_is_lossless():
    """The train step feeds the mask/keypoint branches a positives-first
    compact prefix of the sampled rois (reference mask_head.py
    keep_only_positive_boxes:14-36 as a static gather).  The branches are
    per-roi maps and both losses weight invalid slots by zero with a
    positives-count denominator, so the compacted loss must EQUAL the
    full-set loss bit-for-bit — pinned here on the keypoint loss."""
    from abr_iod_tpu.models.keypoint_head import keypoint_rcnn_loss

    B, S, frac, H, K = 2, 16, 0.25, 8, 5
    cap = int(S * frac)
    rng = np.random.RandomState(0)
    # <= cap positives per image, scattered anywhere
    is_pos = np.zeros((B, S), bool)
    for i in range(B):
        is_pos[i, rng.choice(S, rng.randint(1, cap + 1), replace=False)] = True
    logits = rng.randn(B, S, H, H, K).astype(np.float32)
    rois = np.zeros((B, S, 4), np.float32)
    rois[..., 2:] = rng.uniform(20, 60, (B, S, 2))
    kps = np.zeros((B, S, K, 3), np.float32)
    kps[..., 0] = rng.uniform(0, 50, (B, S, K))
    kps[..., 1] = rng.uniform(0, 50, (B, S, K))
    kps[..., 2] = rng.randint(0, 3, (B, S, K))

    full = keypoint_rcnn_loss(
        jnp.asarray(logits.reshape(B * S, H, H, K)),
        jnp.asarray(rois.reshape(B * S, 4)),
        jnp.asarray(kps.reshape(B * S, K, 3)),
        jnp.asarray(is_pos.reshape(B * S)),
    )
    order = jnp.argsort(jnp.where(jnp.asarray(is_pos), 0, 1),
                        axis=1, stable=True)[:, :cap]
    g = jax.vmap(lambda a, i: a[i])
    compact = keypoint_rcnn_loss(
        g(jnp.asarray(logits), order).reshape(B * cap, H, H, K),
        g(jnp.asarray(rois), order).reshape(B * cap, 4),
        g(jnp.asarray(kps), order).reshape(B * cap, K, 3),
        g(jnp.asarray(is_pos), order).reshape(B * cap),
    )
    assert float(full) == float(compact), (float(full), float(compact))
