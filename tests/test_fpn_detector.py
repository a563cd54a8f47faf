"""FPN Faster R-CNN end-to-end: CONV_BODY R-50-FPN with the standard
GeneralizedRCNN meta-architecture builds the FPN detector (reference
backbone.py:23-43 registry + rpn USE_FPN path) and its train/eval steps
run with finite, decreasing losses — not a silently-substituted C4 model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from abr_iod_tpu.config import get_default_config
from abr_iod_tpu.engine import Batch, TrainState
from abr_iod_tpu.engine.train import make_train_step
from abr_iod_tpu.engine.inference import make_eval_step
from abr_iod_tpu.models.build import build_detection_model
from abr_iod_tpu.models.fpn_detector import FasterRCNNFPN
from abr_iod_tpu.solver.optim import make_optimizer

CANVAS = (64, 128)  # divisible by 64 (P6)


def tiny_fpn_cfg():
    cfg = get_default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RPN.ANCHOR_SIZES = (8, 16, 32, 64, 128)  # one per level
    cfg.MODEL.RPN.ASPECT_RATIOS = (0.5, 1.0, 2.0)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 4
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TPU.FPN_BACKBONE_STAGES = (1, 1, 1, 1)
    cfg.TPU.CANVAS_TRAIN = CANVAS
    cfg.TPU.CANVAS_TEST = CANVAS
    cfg.TPU.PRE_NMS_TOP_N_TRAIN = 64
    cfg.TPU.POST_NMS_TOP_N_TRAIN = 16
    cfg.TPU.PRE_NMS_TOP_N_TEST = 64
    cfg.TPU.POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_GT = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.EVAL_NMS_PER_CLASS_TOPK = 10
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    return cfg


def synth_batch(rng, b=2):
    max_gt = 8
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), bool)
    for i in range(b):
        for j in range(3):
            x1, y1 = rng.uniform(0, 70), rng.uniform(0, 30)
            gt_boxes[i, j] = [x1, y1, x1 + rng.uniform(12, 40), y1 + rng.uniform(12, 28)]
            gt_labels[i, j] = rng.randint(1, 4)
            gt_mask[i, j] = True
    return Batch(
        pixels=jnp.asarray(rng.randn(b, *CANVAS, 3).astype(np.float32)),
        sizes=jnp.tile(jnp.asarray([list(CANVAS)], jnp.int32), (b, 1)),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_mask=jnp.asarray(gt_mask),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_fpn_cfg()
    model = build_detection_model(cfg)
    assert isinstance(model, FasterRCNNFPN)  # not a silently-built C4
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    return cfg, model, params


def test_fpn_detector_builds_and_runs(setup):
    cfg, model, params = setup
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    out = model.apply(params, px, rois)
    # 5 pyramid levels at strides 4..64
    assert len(out["pyramid_shapes"]) == 5
    assert out["pyramid_shapes"][0][1:3] == (CANVAS[0] // 4, CANVAS[1] // 4)
    assert out["pyramid_shapes"][4][1:3] == (CANVAS[0] // 64, CANVAS[1] // 64)
    assert out["cls_logits"].shape == (1, 1, 4)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_fpn_train_step_learns(setup):
    cfg, model, params = setup
    rng = np.random.RandomState(0)
    # the jitted step donates its state — train on a copy so the shared
    # fixture params stay alive for the other tests
    params = jax.tree_util.tree_map(jnp.array, params)
    tx = make_optimizer(cfg, params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step, _ = make_train_step(model, tx, cfg, CANVAS)
    batch = synth_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses  # same batch → loss must drop


def test_fpn_eval_step_produces_detections(setup):
    cfg, model, params = setup
    eval_step, _ = make_eval_step(model, cfg, CANVAS)
    rng = np.random.RandomState(1)
    px = jnp.asarray(rng.randn(2, *CANVAS, 3).astype(np.float32))
    sizes = jnp.tile(jnp.asarray([list(CANVAS)], jnp.int32), (2, 1))
    dets = eval_step(params, px, sizes)
    assert dets.boxes.shape[0] == 2 and dets.boxes.shape[2] == 4
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_fpn_mask_variant_runs():
    cfg = tiny_fpn_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (8, 8)
    model = build_detection_model(cfg)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    out = model.apply(params, px, rois)
    # 14x14 pool -> deconv 2x -> 28x28 per-class masks
    assert out["mask_logits"].shape == (1, 1, 28, 28, 4)


def test_unknown_conv_body_rejected():
    cfg = tiny_fpn_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C6"
    with pytest.raises(ValueError, match="CONV_BODY"):
        build_detection_model(cfg)
