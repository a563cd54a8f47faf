"""Evaluation forward pass (reference: engine/inference.py:43-101 —
per-image eval forward → box head postprocess; the reference disabled
its multi-GPU gather (inference.py:136-137); here the eval step is
batch-sharded over the mesh like training, fixing that wart).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.anchors import anchors_for_shape
from ..models.proposals import (
    select_proposals, effective_top_n, effective_approx_recall,
)
from ..models.postprocess import postprocess_detections
from ..models.rpn import flatten_rpn_outputs


def make_eval_step(model, cfg, canvas_hw, stride: int = 16):
    """Anchors come from the traced pixel shape, so the same eval step
    serves landscape and transposed-portrait canvases (two cached
    executables; see make_train_step)."""
    if getattr(model, "is_retinanet", False):
        from .retinanet import make_retinanet_eval_step

        return make_retinanet_eval_step(model, cfg, canvas_hw)
    if getattr(model, "is_fpn", False):
        from .fpn import make_fpn_eval_step

        return make_fpn_eval_step(model, cfg, canvas_hw)

    @jax.jit
    def eval_step(params, pixels, sizes):
        anchors = anchors_for_shape(
            cfg, pixels.shape[1], pixels.shape[2], stride
        )
        features, _ = model.apply(params, pixels, method="backbone")
        objectness, box_deltas = model.apply(params, features, method="rpn")
        obj_f, reg_f = flatten_rpn_outputs(objectness, box_deltas)
        props = select_proposals(
            obj_f, reg_f, anchors, sizes,
            pre_nms_top_n=effective_top_n(cfg, train=False)[0],
            post_nms_top_n=effective_top_n(cfg, train=False)[1],
            nms_thresh=float(cfg.MODEL.RPN.NMS_THRESH),
            min_size=float(cfg.MODEL.RPN.MIN_SIZE),
            approx_recall=effective_approx_recall(cfg),
        )
        if getattr(model, "rpn_only", False):
            # MODEL.RPN_ONLY: the proposals ARE the result (reference
            # generalized_rcnn.py:80-86); labels carry 0 — objectness has
            # no class
            from ..models.postprocess import Detections

            return Detections(
                props.boxes, props.scores,
                jnp.zeros(props.scores.shape, jnp.int32), props.valid,
            )
        cls_logits, box_reg, _, _ = model.apply(
            params, features, props.boxes, method="roi_heads"
        )
        dets = postprocess_detections(
            cls_logits, box_reg, props.boxes, props.valid, sizes,
            score_thresh=float(cfg.MODEL.ROI_HEADS.SCORE_THRESH),
            nms_thresh=float(cfg.MODEL.ROI_HEADS.NMS),
            detections_per_img=int(cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG),
            per_class_topk=int(cfg.TPU.EVAL_NMS_PER_CLASS_TOPK),
        )
        if getattr(model, "mask_on", False):
            # mask inference on the FINAL detections (reference
            # roi_heads.py:45-63 + mask_head/inference.py:12-90): pool the
            # detected boxes, take each detection's own class channel, sigmoid
            mask_logits = model.apply(
                params, features, dets.boxes, method="mask_heads"
            )  # [B, D, 2P, 2P, C]
            per_class = jnp.take_along_axis(
                mask_logits,
                dets.labels.clip(0)[:, :, None, None, None].astype(jnp.int32),
                axis=4,
            )[..., 0]
            return dets, jax.nn.sigmoid(per_class.astype(jnp.float32))
        if getattr(model, "keypoint_on", False):
            # raw per-detection heatmaps come back to the host, which
            # decodes with the reference's exact cv2 upsample + sub-bin
            # argmax (heatmaps_to_keypoints_np) in original coordinates
            kp_logits = model.apply(
                params, features, dets.boxes, method="keypoint_heads"
            )  # [B, D, Hm, Hm, K]
            return dets, kp_logits
        return dets

    anchors = anchors_for_shape(cfg, canvas_hw[0], canvas_hw[1], stride)
    return eval_step, anchors
