"""RetinaNet training: engine steps + loss parity vs a numpy restatement
of the reference (modeling/rpn/retinanet/loss.py:43-81).

The reference trains RetinaNet through the same generic loop as the
two-stage families; these tests pin (a) the loss semantics — matching at
.5/.4 with low-quality recovery, between-thresholds anchors ignored by
the focal term, targets encoded with the RetinaNet BoxCoder (10,10,5,5),
and the BATCH-level normalizations cls/(pos_total+N_images) and
reg/max(1, pos_total*BBOX_REG_WEIGHT) — and (b) that the engine's
make_train_step / make_eval_step dispatch trains and evals the
single-stage detector end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abr_iod_tpu.models.retinanet import (
    flatten_retinanet_outputs,
    retinanet_anchors,
    retinanet_loss,
)
from tests.torch_ref_train import BELOW, BETWEEN, encode_np, iou_np, match_np

pytestmark = pytest.mark.slow  # compile-heavy tier

GAMMA, ALPHA, BETA, REG_W = 2.0, 0.25, 0.11, 4.0


def _smooth_l1_np(x, beta):
    ax = np.abs(x)
    return np.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _focal_np(logits, t, gamma=GAMMA, alpha=ALPHA):
    """layers/sigmoid_focal_loss.py CPU kernel restated: class j in 1..C-1
    is positive where t == j, negative where t >= 0 and t != j; t == -1
    contributes nothing."""
    c = logits.shape[1]
    out = 0.0
    p = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
    for j in range(1, c + 1):
        pj = p[:, j - 1]
        pos = t == j
        neg = (t >= 0) & (t != j)
        out += np.sum(-alpha * pos * (1 - pj) ** gamma * np.log(pj))
        out += np.sum(-(1 - alpha) * neg * pj ** gamma * np.log(1 - pj))
    return out


def test_retinanet_loss_matches_reference_restatement(rng):
    c_m1, n_img = 3, 2
    anchors = retinanet_anchors(
        [(8, 12), (4, 6)], strides=(8, 16), sizes=(32, 64),
        ratios=(0.5, 1.0), scales_per_octave=2)
    n = anchors.shape[0]
    logits = rng.randn(n_img, n, c_m1).astype(np.float32)
    reg = (rng.randn(n_img, n, 4) * 0.2).astype(np.float32)

    gt_boxes = np.zeros((n_img, 4, 4), np.float32)
    gt_labels = np.zeros((n_img, 4), np.int32)
    gt_mask = np.zeros((n_img, 4), bool)
    raw = [
        [(4, 4, 40, 40, 1), (30, 10, 90, 60, 3)],
        [(8, 20, 70, 86, 2)],
    ]
    for i, items in enumerate(raw):
        for j, (x1, y1, x2, y2, cls) in enumerate(items):
            gt_boxes[i, j] = [x1, y1, x2, y2]
            gt_labels[i, j] = cls
            gt_mask[i, j] = True

    cls_ours, reg_ours = retinanet_loss(
        jnp.asarray(logits), jnp.asarray(reg), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask))

    # ---- reference restatement
    cls_sum, reg_sum, pos_total = 0.0, 0.0, 0
    for i in range(n_img):
        gtb = gt_boxes[i][gt_mask[i]]
        quality = iou_np(gtb, anchors)
        m = match_np(quality, 0.5, 0.4, allow_low_quality=True)
        t = gt_labels[i][gt_mask[i]][m.clip(0)].astype(np.int64)
        t[m == BELOW] = 0
        t[m == BETWEEN] = -1
        pos = t > 0
        pos_total += int(pos.sum())
        cls_sum += _focal_np(logits[i], t)
        tgt = encode_np(gtb[m.clip(0)], anchors, (10.0, 10.0, 5.0, 5.0))
        reg_sum += _smooth_l1_np(reg[i] - tgt, BETA).sum(-1)[pos].sum()
    assert pos_total > 0, "probe must produce positive anchors"
    want_cls = cls_sum / (pos_total + n_img)
    want_reg = reg_sum / max(1, pos_total * REG_W)
    np.testing.assert_allclose(float(cls_ours), want_cls, rtol=2e-4)
    np.testing.assert_allclose(float(reg_ours), want_reg, rtol=2e-4)


def _tiny_cfg():
    from abr_iod_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.RETINANET.ANCHOR_SIZES = (16, 32, 64, 128, 256)
    cfg.MODEL.RETINANET.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RETINANET.SCALES_PER_OCTAVE = 2
    cfg.MODEL.RETINANET.NUM_CONVS = 1
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 8
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1, 1)
    cfg.TPU.RETINANET_CHANNELS = 16
    cfg.TPU.CANVAS_TRAIN = (64, 96)
    cfg.TPU.CANVAS_TEST = (64, 96)
    cfg.TPU.MAX_GT = 4
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = ()
    return cfg


def test_retinanet_engine_train_step_learns(rng):
    from abr_iod_tpu.engine import Batch, TrainState
    from abr_iod_tpu.engine.train import make_train_step
    from abr_iod_tpu.models.build import build_detection_model
    from abr_iod_tpu.solver.optim import make_optimizer

    cfg = _tiny_cfg()
    model = build_detection_model(cfg)
    assert getattr(model, "is_retinanet", False)
    pixels = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pixels)
    tx = make_optimizer(cfg, params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step, _ = make_train_step(model, tx, cfg, (64, 96))

    gt_boxes = np.zeros((2, 4, 4), np.float32)
    gt_labels = np.zeros((2, 4), np.int32)
    gt_mask = np.zeros((2, 4), bool)
    gt_boxes[0, 0] = [8, 8, 40, 40]
    gt_labels[0, 0] = 2
    gt_mask[0, 0] = True
    gt_boxes[1, 0] = [20, 30, 80, 60]
    gt_labels[1, 0] = 4
    gt_mask[1, 0] = True
    batch = Batch(
        pixels=pixels,
        sizes=jnp.asarray([[64, 96], [64, 96]], jnp.int32),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_mask=jnp.asarray(gt_mask),
    )
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert float(metrics["loss_retina_cls"]) > 0


def test_retinanet_engine_eval_step_produces_detections(rng):
    from abr_iod_tpu.engine.inference import make_eval_step
    from abr_iod_tpu.models.build import build_detection_model

    cfg = _tiny_cfg()
    model = build_detection_model(cfg)
    pixels = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pixels)
    eval_step, _ = make_eval_step(model, cfg, (64, 96))
    dets = eval_step(params, pixels, jnp.asarray([[64, 96]], jnp.int32))
    assert dets.boxes.shape[0] == 1 and dets.boxes.shape[2] == 4
    # prior-prob init keeps every score below the .05 inference threshold
    assert not bool(np.asarray(dets.valid).any())


def test_retinanet_driver_init_params(rng):
    """init_params handles the single-stage apply surface (no RoI arg)."""
    from abr_iod_tpu.engine.driver import init_params
    from abr_iod_tpu.models.build import build_detection_model

    cfg = _tiny_cfg()
    model = build_detection_model(cfg)
    params = init_params(cfg, model)
    assert "head" in params["params"]
