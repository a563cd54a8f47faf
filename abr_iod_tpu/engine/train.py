"""First-task / joint training step (reference: engine/trainer.py:40-143 +
tools/train_first_step.py:35-116), compiled as ONE jit program.

The whole iteration — backbone, RPN, proposal selection, matching,
sampling, RoI head, losses, SGD update — is a single XLA program over a
batch-sharded input on the device mesh; the gradient all-reduce that DDP
did on GPU is inserted by XLA (SURVEY.md §2.9 TPU-native mapping).
Loss metrics come back already globally averaged, which subsumes the
reference's ``reduce_loss_dict`` collective (engine/trainer.py:15-37).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models import losses as L
from ..models.anchors import anchors_for_shape, anchor_visibility
from ..models.proposals import (
    select_proposals, append_gt_proposals, effective_top_n, effective_approx_recall,
)
from ..models.rpn import flatten_rpn_outputs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    pixels: jnp.ndarray  # [B, H, W, 3] normalized
    sizes: jnp.ndarray  # [B, 2] valid (h, w)
    gt_boxes: jnp.ndarray  # [B, M, 4]
    gt_labels: jnp.ndarray  # [B, M] int32
    gt_mask: jnp.ndarray  # [B, M] bool
    # optional task targets (None when the dataset/config doesn't use them)
    gt_mask_crops: Any = None  # [B, M, R, R] box-normalized instance masks
    gt_keypoints: Any = None  # [B, M, K, 3] (x, y, vis) in canvas coords


def forward_detection_losses(model, params, batch: Batch, key, cfg, anchors,
                             dist_type: str = "none", n_old_classes: int = 0,
                             stop_backbone_grad_in_proposals: bool = True,
                             extra_rois=None):
    """Shared forward+loss computation; returns (total, metrics, aux).

    aux carries everything the incremental step's distillation needs
    (features, backbone features, rpn outputs, sampled roi features,
    student logits) — mirroring GeneralizedRCNN's training forward
    return tuple (generalized_rcnn.py:89-93).

    extra_rois [B, E, 4]: additional boxes (the teacher's soften
    proposals) to score in the SAME box-head pass — one res5 invocation
    over S+E RoIs instead of two (the 64-RoI rescore pass alone
    under-utilizes the MXU); their outputs land in aux["extra_*"].
    """
    k_rpn, k_roi = jax.random.split(key)

    features, backbone_feats = model.apply(params, batch.pixels, method="backbone")
    objectness, box_deltas = model.apply(params, features, method="rpn")
    obj_f, reg_f = flatten_rpn_outputs(objectness, box_deltas)

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
        # MODEL.RPN_ONLY: proposal network training — RPN losses are the
        # whole objective (reference generalized_rcnn.py:107-119)
        total = obj_loss + rpn_box_loss
        metrics = {"loss_objectness": obj_loss,
                   "loss_rpn_box_reg": rpn_box_loss, "loss": total}
        aux = {"features": features, "backbone_features": backbone_feats,
               "rpn_objectness": objectness, "rpn_box_deltas": box_deltas}
        return total, metrics, aux

    props = select_proposals(
        jax.lax.stop_gradient(obj_f),
        jax.lax.stop_gradient(reg_f),
        anchors,
        batch.sizes,
        pre_nms_top_n=effective_top_n(cfg, train=True)[0],
        post_nms_top_n=effective_top_n(cfg, train=True)[1],
        nms_thresh=float(cfg.MODEL.RPN.NMS_THRESH),
        min_size=float(cfg.MODEL.RPN.MIN_SIZE),
        approx_recall=effective_approx_recall(cfg),
    )
    props = append_gt_proposals(props, batch.gt_boxes, batch.gt_mask)

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

    head_rois = rois
    if extra_rois is not None:
        head_rois = jnp.concatenate([rois, extra_rois], axis=1)
    cls_logits, box_reg, roi_feats, _ = model.apply(
        params, features, head_rois, method="roi_heads"
    )
    extra = None
    if extra_rois is not None:
        s = rois.shape[1]
        extra = (cls_logits[:, s:], box_reg[:, s:], roi_feats[:, s:])
        cls_logits, box_reg, roi_feats = (
            cls_logits[:, :s], box_reg[:, :s], roi_feats[:, :s]
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
    }

    # optional task heads on the shared pooled features (reference C4
    # roi_heads combiner, roi_heads/roi_heads.py:23-63: the mask/keypoint
    # branches consume the box branch's features and add their losses).
    # The reference trains these branches on the POSITIVE rois only
    # (mask_head.py keep_only_positive_boxes:14-36; keypoint_head.py:26-31)
    # — its dynamic-shape subset becomes a static compaction here: the
    # sampler caps positives at S*POSITIVE_FRACTION, so a stable
    # positives-first argsort truncated to that cap keeps every positive
    # and the loss over the compact set is EXACTLY the full-set loss
    # (invalid slots carry zero weight), at 1/4 the branch FLOPs.
    task_heads_on = (
        (batch.gt_mask_crops is not None and getattr(model, "mask_on", False))
        or (batch.gt_keypoints is not None
            and getattr(model, "keypoint_on", False))
    )
    if task_heads_on:
        s_pos = max(
            int(rois.shape[1]
                * float(cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION)), 1)
        is_pos = rvalid & rpos
        order = jnp.argsort(
            jnp.where(is_pos, 0, 1), axis=1, stable=True)[:, :s_pos]
        gather = jax.vmap(lambda a, i: a[i])
        p_rois = gather(rois, order)
        p_pos = gather(is_pos, order)
        p_labels = gather(rlabels, order)
        p_matched = gather(rmatched, order)
        p_feats = gather(roi_feats, order)

    if batch.gt_mask_crops is not None and getattr(model, "mask_on", False):
        from ..models.mask_head import mask_rcnn_loss_from_crops

        if hasattr(model, "mask_from_roi_features"):
            mask_logits = model.apply(
                params, p_feats, method="mask_from_roi_features"
            )  # [B, S_pos, 2P, 2P, C]
        else:
            # non-shared mask extractor (FBNet: its own pool + 'mask'
            # blocks, reference fbnet.py:240-248)
            mask_logits = model.apply(params, features, p_rois,
                                      method="mask_heads")
        loss_mask = mask_rcnn_loss_from_crops(
            mask_logits, p_rois, p_labels, p_pos,
            batch.gt_mask_crops, batch.gt_boxes, p_matched,
        )
        total = total + loss_mask
        metrics["loss_mask"] = loss_mask

    if batch.gt_keypoints is not None and getattr(model, "keypoint_on", False):
        from ..models.keypoint_head import keypoint_rcnn_loss

        if hasattr(model, "keypoints_from_roi_features"):
            kp_logits = model.apply(
                params, p_feats, method="keypoints_from_roi_features"
            )  # [B, S_pos, H, H, K]
        else:
            # non-shared keypoint extractor (FBNet: its own pool + 'kpts'
            # blocks, reference fbnet.py:225-237)
            kp_logits = model.apply(params, features, p_rois,
                                    method="keypoint_heads")
        b_, s_ = p_rois.shape[:2]
        roi_kps = jax.vmap(lambda kps, m: kps[m])(batch.gt_keypoints, p_matched)
        loss_kp = keypoint_rcnn_loss(
            kp_logits.reshape((b_ * s_,) + kp_logits.shape[2:]),
            p_rois.reshape(b_ * s_, 4),
            roi_kps.reshape(b_ * s_, *roi_kps.shape[2:]),
            p_pos.reshape(b_ * s_),
        )
        total = total + loss_kp
        metrics["loss_kp"] = loss_kp

    metrics["loss"] = total
    aux = {
        "features": features,
        "backbone_features": backbone_feats,
        "rpn_objectness": objectness,
        "rpn_box_deltas": box_deltas,
        "proposals": props,
        "rois": rois,
        "roi_valid": rvalid,
        "roi_features": roi_feats,
        "cls_logits": cls_logits,
        "box_reg": box_reg,
    }
    if extra is not None:
        aux["extra_cls_logits"], aux["extra_box_reg"], aux["extra_roi_features"] = extra
    return total, metrics, aux


def forward_with_external_proposals(model, params, batch: Batch, proposals_boxes,
                                    proposals_valid, key, cfg,
                                    dist_type: str = "none", n_old_classes: int = 0):
    """Training losses with externally-supplied proposals (the reference's
    EXTERNAL_PROPOSAL / EdgeBoxes path, generalized_rcnn.py:97-119):
    skips the RPN losses and proposal selection, samples RoIs directly
    from the given boxes."""
    features, _ = model.apply(params, batch.pixels, method="backbone")
    roi_tgts = L.prepare_roi_targets(
        proposals_boxes, proposals_valid, batch.gt_boxes, batch.gt_labels,
        batch.gt_mask,
        fg_iou=float(cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD),
        bg_iou=float(cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD),
        bbox_reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
    )
    rois, rlabels, rtgts, rvalid, _, _ = L.subsample_rois(
        roi_tgts, proposals_boxes, key,
        batch_size_per_image=int(cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE),
        positive_fraction=float(cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION),
    )
    cls_logits, box_reg, _, _ = model.apply(
        params, features, jax.lax.stop_gradient(rois), method="roi_heads"
    )
    cls_loss, box_loss = L.roi_box_loss(
        cls_logits, box_reg, rlabels, rtgts, rvalid,
        dist_type=dist_type, n_old_classes=n_old_classes,
    )
    total = cls_loss + box_loss
    return total, {"loss_classifier": cls_loss, "loss_box_reg": box_loss,
                   "loss": total}


def make_train_step(model, tx, cfg, canvas_hw, stride: int = 16):
    """Build the jitted first-task train step.

    Anchors are derived from the traced batch shape (constant-folded per
    compiled program), so one step function serves both the landscape and
    the transposed portrait canvas — jit re-traces per input shape, giving
    two cached executables (the TPU analogue of the reference's
    aspect-ratio-grouped ragged batches, grouped_batch_sampler.py:9-113).
    """

    if getattr(model, "is_retinanet", False):
        from .retinanet import make_retinanet_train_step

        return make_retinanet_train_step(model, tx, cfg, canvas_hw)
    if getattr(model, "is_fpn", False):
        from .fpn import make_fpn_train_step

        return make_fpn_train_step(model, tx, cfg, canvas_hw)

    def loss_fn(params, batch, key):
        anchors = anchors_for_shape(
            cfg, batch.pixels.shape[1], batch.pixels.shape[2], stride
        )
        total, metrics, _ = forward_detection_losses(
            model, params, batch, key, cfg, anchors
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

    anchors = anchors_for_shape(cfg, canvas_hw[0], canvas_hw[1], stride)
    return train_step, anchors
