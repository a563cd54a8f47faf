"""RetinaNet train/eval steps (reference: modeling/rpn/retinanet/
retinanet.py RetinaNetModule.forward — the single-stage family runs
through the same generic engine loop as the two-stage detectors; loss per
retinanet/loss.py, inference per retinanet/inference.py).

Anchors are built at trace time from the pyramid shapes (one octave-scaled
set per level, config MODEL.RETINANET.*), exactly like the C4/FPN
families' trace-time anchor grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.retinanet import (
    flatten_retinanet_outputs,
    retinanet_anchors,
    retinanet_loss,
    retinanet_postprocess,
)
from .train import TrainState


def retinanet_anchors_per_level(cfg, feat_shapes):
    """Per-level [N_l, 4] anchor arrays from the traced pyramid shapes."""
    r = cfg.MODEL.RETINANET
    if not (len(feat_shapes) == len(r.ANCHOR_STRIDES) == len(r.ANCHOR_SIZES)):
        raise ValueError(
            f"RETINANET.ANCHOR_STRIDES/SIZES must match the pyramid: "
            f"{len(feat_shapes)} levels vs strides {tuple(r.ANCHOR_STRIDES)} "
            f"sizes {tuple(r.ANCHOR_SIZES)}"
        )
    out = []
    for hw, stride, size in zip(
        feat_shapes, tuple(r.ANCHOR_STRIDES), tuple(r.ANCHOR_SIZES)
    ):
        out.append(jnp.asarray(retinanet_anchors(
            [tuple(hw)], strides=[int(stride)], sizes=[int(size)],
            ratios=tuple(r.ASPECT_RATIOS), octave=float(r.OCTAVE),
            scales_per_octave=int(r.SCALES_PER_OCTAVE))))
    return out


def retinanet_forward_losses(model, params, batch, cfg):
    """Forward + the two RetinaNet losses (reference retinanet.py:120-151
    _forward_train: the head losses ARE the whole objective)."""
    r = cfg.MODEL.RETINANET
    logits, bbox = model.apply(params, batch.pixels)
    shapes = [tuple(l.shape[1:3]) for l in logits]
    anchors = jnp.concatenate(retinanet_anchors_per_level(cfg, shapes), axis=0)
    fl, fb = flatten_retinanet_outputs(logits, bbox, int(r.NUM_CLASSES) - 1)
    cls_l, reg_l = retinanet_loss(
        fl.astype(jnp.float32), fb.astype(jnp.float32), anchors,
        batch.gt_boxes, batch.gt_labels, batch.gt_mask,
        fg_iou=float(r.FG_IOU_THRESHOLD), bg_iou=float(r.BG_IOU_THRESHOLD),
        gamma=float(r.LOSS_GAMMA), alpha=float(r.LOSS_ALPHA),
        beta=float(r.BBOX_REG_BETA), reg_weight=float(r.BBOX_REG_WEIGHT),
    )
    total = cls_l + reg_l
    return total, {
        "loss_retina_cls": cls_l,
        "loss_retina_reg": reg_l,
        "loss": total,
    }


def make_retinanet_train_step(model, tx, cfg, canvas_hw):
    """Single-stage analogue of train.make_train_step: one jit step."""

    def loss_fn(params, batch):
        return retinanet_forward_losses(model, params, batch, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step, None


def make_retinanet_eval_step(model, cfg, canvas_hw):
    """Single-stage analogue of inference.make_eval_step: returns the same
    Detections pytree, so run_test's VOC/COCO protocols work unchanged."""
    r = cfg.MODEL.RETINANET

    @jax.jit
    def eval_step(params, pixels, sizes):
        logits, bbox = model.apply(params, pixels)
        shapes = [tuple(l.shape[1:3]) for l in logits]
        anchors_l = retinanet_anchors_per_level(cfg, shapes)
        return retinanet_postprocess(
            logits, bbox, anchors_l, sizes,
            num_classes=int(r.NUM_CLASSES),
            pre_nms_thresh=float(r.INFERENCE_TH),
            pre_nms_top_n=int(r.PRE_NMS_TOP_N),
            nms_thresh=float(r.NMS_TH),
            detections_per_img=int(cfg.TEST.DETECTIONS_PER_IMG),
        )

    return eval_step, None
