"""FPN Faster R-CNN train/eval steps (reference: rpn/inference.py FPN
branch :149-176 + rpn/loss.py over concatenated per-level anchors +
engine/trainer.py).

Differences from the C4 path (engine/train.py):
  * anchors come per level — one ANCHOR_SIZE per pyramid level at strides
    4/8/16/32/64 — and are concatenated for target assignment (the
    reference's loss also concatenates, rpn/loss.py:104-120)
  * proposal selection runs per level (top-k + NMS with the usual
    PRE/POST counts applied per level), then the union is reduced to the
    cross-level FPN_POST_NMS_TOP_N by objectness
    (rpn/inference.py select_over_all_levels:149-176)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import losses as L
from ..models.anchors import grid_anchors, anchor_visibility
from ..models.fpn_detector import FPN_STRIDES
from ..models.postprocess import postprocess_detections
from ..models.proposals import (
    select_proposals, append_gt_proposals, effective_top_n, effective_approx_recall,
    _cap as proposal_cap,
)
from ..models.rpn import flatten_rpn_outputs
from .train import Batch, TrainState


def fpn_level_anchors(cfg, pyramid_shapes):
    """Per-level anchor grids from the traced pyramid shapes: one
    ANCHOR_SIZE per level (reference anchor_generator FPN convention —
    len(ANCHOR_SIZES) must equal the number of levels)."""
    sizes = tuple(cfg.MODEL.RPN.ANCHOR_SIZES)
    ratios = tuple(cfg.MODEL.RPN.ASPECT_RATIOS)
    n = len(pyramid_shapes)
    if len(sizes) != n:
        raise ValueError(
            f"FPN needs one MODEL.RPN.ANCHOR_SIZES entry per level: "
            f"{len(sizes)} sizes for {n} levels"
        )
    out = []
    for (_, h, w, _), stride, size in zip(pyramid_shapes, FPN_STRIDES, sizes):
        out.append(jnp.asarray(grid_anchors(h, w, stride, (size,), ratios)))
    return out


def _select_fpn_proposals(rpn_outs, anchors_l, sizes, cfg, train: bool):
    """Per-level selection then cross-level top-N
    (reference rpn/inference.py:120-176)."""
    pre, post = effective_top_n(cfg, train=train)
    mode = "TRAIN" if train else "TEST"
    fpn_post_ref = int(cfg.MODEL.RPN[f"FPN_POST_NMS_TOP_N_{mode}"])
    fpn_post = min(fpn_post_ref, proposal_cap(cfg, "POST", mode, fpn_post_ref))
    boxes, scores, valid = [], [], []
    for (obj, reg), anchors in zip(rpn_outs, anchors_l):
        obj_f, reg_f = flatten_rpn_outputs(obj, reg)
        p = select_proposals(
            jax.lax.stop_gradient(obj_f),
            jax.lax.stop_gradient(reg_f),
            anchors, sizes,
            pre_nms_top_n=min(pre, obj_f.shape[1]),
            post_nms_top_n=post,
            nms_thresh=float(cfg.MODEL.RPN.NMS_THRESH),
            min_size=float(cfg.MODEL.RPN.MIN_SIZE),
            approx_recall=effective_approx_recall(cfg),
        )
        boxes.append(p.boxes)
        scores.append(p.scores)
        valid.append(p.valid)
    boxes = jnp.concatenate(boxes, axis=1)
    scores = jnp.concatenate(scores, axis=1)
    valid = jnp.concatenate(valid, axis=1)
    # cross-level top-N by objectness (select_over_all_levels; the
    # per-image variant — FPN_POST_NMS_PER_BATCH only changes how the
    # budget is shared at train time, and a static per-image budget is
    # the TPU-shaped equivalent)
    k = min(fpn_post, boxes.shape[1])
    masked = jnp.where(valid, scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, k)
    return (
        jnp.take_along_axis(boxes, idx[..., None], axis=1),
        top,
        jnp.take_along_axis(valid, idx, axis=1),
    )


def fpn_forward_detection_losses(model, params, batch: Batch, key, cfg,
                                 dist_type: str = "none",
                                 n_old_classes: int = 0):
    """FPN analogue of train.forward_detection_losses.

    Returns (total, metrics, aux); aux carries the pyramid and per-level
    RPN outputs the incremental step's distillation consumes (the
    reference machinery is backbone-generic, generalized_rcnn.py:121-296)."""
    k_rpn, k_roi = jax.random.split(key)

    pyramid, _ = model.apply(params, batch.pixels, method="backbone")
    rpn_outs = model.apply(params, pyramid, method="rpn")
    anchors_l = fpn_level_anchors(cfg, [p.shape for p in pyramid])
    anchors = jnp.concatenate(anchors_l, axis=0)
    obj_f = jnp.concatenate(
        [flatten_rpn_outputs(o, r)[0] for o, r in rpn_outs], axis=1
    )
    reg_f = jnp.concatenate(
        [flatten_rpn_outputs(o, r)[1] for o, r in rpn_outs], axis=1
    )

    vis = anchor_visibility(
        anchors[None, :, :], batch.sizes[:, 0:1].astype(jnp.float32),
        batch.sizes[:, 1:2].astype(jnp.float32),
        straddle_thresh=float(cfg.MODEL.RPN.STRADDLE_THRESH),
    )
    rpn_tgts = L.prepare_rpn_targets(
        anchors, vis, batch.gt_boxes, batch.gt_labels, batch.gt_mask
    )
    obj_loss, rpn_box_loss = L.rpn_loss(
        obj_f, reg_f, rpn_tgts, k_rpn,
        batch_size_per_image=int(cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE),
        positive_fraction=float(cfg.MODEL.RPN.POSITIVE_FRACTION),
        anchors=anchors, gt_boxes=batch.gt_boxes,
    )

    if getattr(model, "rpn_only", False):
        # MODEL.RPN_ONLY: the RPN losses are the whole objective (same
        # contract as the C4 path, reference generalized_rcnn.py:107-119)
        total = obj_loss + rpn_box_loss
        return total, {"loss_objectness": obj_loss,
                       "loss_rpn_box_reg": rpn_box_loss, "loss": total}, {
            "pyramid": tuple(pyramid), "rpn_outs": tuple(rpn_outs)}

    pb, ps, pv = _select_fpn_proposals(rpn_outs, anchors_l, batch.sizes, cfg, True)
    from ..models.proposals import Proposals

    props = append_gt_proposals(Proposals(pb, ps, pv), batch.gt_boxes, batch.gt_mask)

    roi_tgts = L.prepare_roi_targets(
        props.boxes, props.valid, batch.gt_boxes, batch.gt_labels, batch.gt_mask,
        fg_iou=float(cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD),
        bg_iou=float(cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD),
        bbox_reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
    )
    rois, rlabels, rtgts, rvalid, rpos, rmatched = L.subsample_rois(
        roi_tgts, props.boxes, k_roi,
        batch_size_per_image=int(cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE),
        positive_fraction=float(cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION),
    )
    rois = jax.lax.stop_gradient(rois)

    cls_logits, box_reg, roi_feats, _ = model.apply(
        params, pyramid, rois, method="roi_heads"
    )
    cls_loss, box_loss = L.roi_box_loss(
        cls_logits, box_reg, rlabels, rtgts, rvalid,
        dist_type=dist_type, n_old_classes=n_old_classes,
    )
    total = obj_loss + rpn_box_loss + cls_loss + box_loss
    metrics = {
        "loss_objectness": obj_loss,
        "loss_rpn_box_reg": rpn_box_loss,
        "loss_classifier": cls_loss,
        "loss_box_reg": box_loss,
        "loss": total,
    }

    if batch.gt_mask_crops is not None and getattr(model, "mask_on", False):
        from ..models.mask_head import mask_rcnn_loss_from_crops

        mask_logits = model.apply(params, pyramid, rois, method="mask_heads")
        mask_loss = mask_rcnn_loss_from_crops(
            mask_logits, rois, rlabels, rvalid & rpos, batch.gt_mask_crops,
            batch.gt_boxes, rmatched,
        )
        total = total + mask_loss
        metrics["loss_mask"] = mask_loss

    if batch.gt_keypoints is not None and getattr(model, "keypoint_on", False):
        from ..models.keypoint_head import keypoint_rcnn_loss

        kp_logits = model.apply(params, pyramid, rois, method="keypoint_heads")
        b_, s_ = rois.shape[:2]
        roi_kps = jax.vmap(lambda kps, m: kps[m])(batch.gt_keypoints, rmatched)
        loss_kp = keypoint_rcnn_loss(
            kp_logits.reshape((b_ * s_,) + kp_logits.shape[2:]),
            rois.reshape(b_ * s_, 4),
            roi_kps.reshape(b_ * s_, *roi_kps.shape[2:]),
            (rvalid & rpos).reshape(b_ * s_),
        )
        total = total + loss_kp
        metrics["loss_kp"] = loss_kp

    metrics["loss"] = total
    aux = {"pyramid": tuple(pyramid), "rpn_outs": tuple(rpn_outs)}
    return total, metrics, aux


def make_fpn_train_step(model, tx, cfg, canvas_hw):
    """FPN analogue of train.make_train_step: one jit step."""

    def loss_fn(params, batch, key):
        total, metrics, _ = fpn_forward_detection_losses(
            model, params, batch, key, cfg
        )
        return total, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Batch):
        key = jax.random.fold_in(jax.random.PRNGKey(int(cfg.SEED)), state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step, None


def make_fpn_eval_step(model, cfg, canvas_hw):
    """FPN analogue of inference.make_eval_step."""

    @jax.jit
    def eval_step(params, pixels, sizes):
        pyramid, _ = model.apply(params, pixels, method="backbone")
        rpn_outs = model.apply(params, pyramid, method="rpn")
        anchors_l = fpn_level_anchors(cfg, [p.shape for p in pyramid])
        pb, ps, pv = _select_fpn_proposals(rpn_outs, anchors_l, sizes, cfg, False)
        if getattr(model, "rpn_only", False):
            # proposals ARE the result (same contract as the C4 eval step)
            from ..models.postprocess import Detections

            return Detections(pb, ps, jnp.zeros(ps.shape, jnp.int32), pv)
        cls_logits, box_reg, _, _ = model.apply(
            params, pyramid, pb, method="roi_heads"
        )
        dets = postprocess_detections(
            cls_logits, box_reg, pb, pv, sizes,
            score_thresh=float(cfg.MODEL.ROI_HEADS.SCORE_THRESH),
            nms_thresh=float(cfg.MODEL.ROI_HEADS.NMS),
            detections_per_img=int(cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG),
            per_class_topk=int(cfg.TPU.EVAL_NMS_PER_CLASS_TOPK),
        )
        # same (dets, extras) contract as the C4 eval step
        # (engine/inference.py:49-75) so run_test handles both families
        if getattr(model, "mask_on", False):
            mask_logits = model.apply(
                params, pyramid, dets.boxes, method="mask_heads"
            )
            per_class = jnp.take_along_axis(
                mask_logits,
                dets.labels.clip(0)[:, :, None, None, None].astype(jnp.int32),
                axis=4,
            )[..., 0]
            return dets, jax.nn.sigmoid(per_class.astype(jnp.float32))
        if getattr(model, "keypoint_on", False):
            # raw heatmaps; the host decodes exactly (same contract as
            # the C4 eval step — heatmaps_to_keypoints_np in the driver)
            kp_logits = model.apply(
                params, pyramid, dets.boxes, method="keypoint_heads"
            )
            return dets, kp_logits
        return dets

    return eval_step, None
