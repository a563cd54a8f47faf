"""Mask/keypoint branches wired into the compiled train step
(reference roi_heads/roi_heads.py:23-63: box + mask + keypoint losses in
one training forward)."""

import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.engine import Batch, TrainState, make_train_step
from abr_iod_tpu.solver.optim import make_optimizer
from abr_iod_tpu.structures.masks import resample_gt_crops_to_rois
from tests.test_train_step import CANVAS, tiny_cfg, tiny_model, synth_batch


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
