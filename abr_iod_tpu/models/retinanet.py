"""RetinaNet (reference: modeling/rpn/retinanet/{retinanet,loss,
inference}.py — registered in the reference but unused by the shipped
ABR configs; kept for model-family completeness).

Head: NUM_CONVS=4 shared conv towers → A*(num_classes-1) cls logits with
prior-prob bias init (-log((1-p)/p), p=.01) + A*4 box deltas per FPN
level.  Loss: sigmoid focal (γ=2, α=.25) over anchors matched at .5/.4
with low-quality recovery, smooth-L1(β=.11) on positives.  Inference
(``retinanet_postprocess``): per-level score threshold (.05) + top-1000
over (anchor, class) candidates → decode(10,10,5,5) → clip → cross-level
per-class NMS(.4) → top-100 over all classes (reference
retinanet/inference.py:14-194), all static-shape.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ..structures import boxes as B
from . import matcher as M
from .anchors import grid_anchors


class RetinaNetHead(nn.Module):
    num_classes: int  # includes background; logits have num_classes-1
    num_anchors: int = 9
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        cls_tower = [
            nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"cls_tower{i}")
            for i in range(self.num_convs)
        ]
        box_tower = [
            nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"bbox_tower{i}")
            for i in range(self.num_convs)
        ]
        bias_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_out = nn.Conv(
            self.num_anchors * (self.num_classes - 1), (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init),
            dtype=self.dtype, name="cls_logits",
        )
        box_out = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="bbox_pred",
        )
        logits, bbox_reg = [], []
        for f in features:
            c = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            logits.append(cls_out(c))
            t = f
            for conv in box_tower:
                t = nn.relu(conv(t))
            bbox_reg.append(box_out(t))
        return logits, bbox_reg


def retinanet_anchors(feat_shapes, strides=(8, 16, 32, 64, 128),
                      sizes=(32, 64, 128, 256, 512), ratios=(0.5, 1.0, 2.0),
                      octave=2.0, scales_per_octave=3):
    """Per-level anchors with octave scales
    (reference anchor_generator.py:140-161). Returns concat [N,4]."""
    import numpy as np

    per_level = []
    for (h, w), stride, size in zip(feat_shapes, strides, sizes):
        level_sizes = tuple(
            size * octave ** (o / scales_per_octave) for o in range(scales_per_octave)
        )
        per_level.append(grid_anchors(h, w, stride, level_sizes, tuple(ratios)))
    return np.concatenate(per_level, axis=0)


def flatten_retinanet_outputs(logits, bbox_reg, num_classes_m1: int):
    """Per-level [B,h,w,A*C]/[B,h,w,A*4] → concat [B,N,C]/[B,N,4]."""
    flat_l, flat_b = [], []
    for l, b in zip(logits, bbox_reg):
        bs, h, w, _ = l.shape
        flat_l.append(l.reshape(bs, h * w, -1, num_classes_m1).reshape(bs, -1, num_classes_m1))
        flat_b.append(b.reshape(bs, h * w, -1, 4).reshape(bs, -1, 4))
    return jnp.concatenate(flat_l, axis=1), jnp.concatenate(flat_b, axis=1)


def retinanet_loss(cls_logits, box_reg, anchors, gt_boxes, gt_labels, gt_mask,
                   fg_iou=0.5, bg_iou=0.4, gamma=2.0, alpha=0.25, beta=0.11,
                   reg_weight=4.0, box_weights=(10.0, 10.0, 5.0, 5.0)):
    """cls_logits [B,N,C-1], box_reg [B,N,4], anchors [N,4]
    (reference retinanet/loss.py:43-81): anchors matched at FG/BG_IOU with
    low-quality recovery, between-thresholds anchors ignored (focal sees
    label -1), targets encoded with the RetinaNet BoxCoder (10,10,5,5 —
    retinanet.py:101), then BATCH-level normalization — cls by
    (total positives + num images), reg by max(1, total positives *
    BBOX_REG_WEIGHT)."""

    def one(logits, reg, boxes, labels, mask):
        quality = B.masked_iou(boxes, mask, anchors, jnp.ones(anchors.shape[0], bool))
        res = M.match(quality, mask, fg_iou, bg_iou, allow_low_quality_matches=True)
        # one fused matched-row take of the [M,5] (box, label) payload
        # for all N anchors (take_matched_rows: the native per-anchor
        # gather pair cost ~16 ms/step at this scale)
        payload = jnp.concatenate(
            [boxes, labels.astype(boxes.dtype)[:, None]], axis=1)
        matched = M.take_matched_rows(payload, res.matched_gt)
        t_labels = matched[:, 4].astype(jnp.int32)
        t_labels = jnp.where(res.matched_idx == M.BELOW_LOW_THRESHOLD, 0, t_labels)
        t_labels = jnp.where(res.matched_idx == M.BETWEEN_THRESHOLDS, -1, t_labels)
        pos = t_labels > 0

        cls_sum = sigmoid_focal_loss(logits, t_labels, gamma=gamma, alpha=alpha).sum()
        reg_targets = B.encode_boxes(matched[:, :4], anchors,
                                     weights=tuple(box_weights))
        reg_l = smooth_l1_loss(reg, reg_targets, beta=beta).sum(-1)
        return cls_sum, jnp.sum(jnp.where(pos, reg_l, 0.0)), jnp.sum(
            pos.astype(jnp.float32))

    cls_sums, reg_sums, n_pos = jax.vmap(one)(
        cls_logits, box_reg, gt_boxes, gt_labels, gt_mask)
    n_images = cls_logits.shape[0]
    pos_total = jnp.sum(n_pos)
    cls_loss = jnp.sum(cls_sums) / (pos_total + n_images)
    reg_loss = jnp.sum(reg_sums) / jnp.maximum(1.0, pos_total * reg_weight)
    return cls_loss, reg_loss


def _retinanet_postprocess_single(
    scores_per_level,  # list of [N_l, C-1] sigmoid scores
    reg_per_level,  # list of [N_l, 4]
    anchors_per_level,  # list of [N_l, 4]
    size_hw,
    pre_nms_thresh: float,
    pre_nms_top_n: int,
    nms_thresh: float,
    detections_per_img: int,
):
    from ..ops.nms import nms_padded

    cand_boxes, cand_scores, cand_labels, cand_valid = [], [], [], []
    for scores, reg, anchors in zip(scores_per_level, reg_per_level,
                                    anchors_per_level):
        n_l, c_m1 = scores.shape
        flat = scores.reshape(-1)
        # candidates are strictly > thresh (inference.py:96); masking
        # non-candidates to -1 makes top-k pick exactly min(count, top_n)
        masked = jnp.where(flat > pre_nms_thresh, flat, -1.0)
        k = min(pre_nms_top_n, flat.shape[0])
        top_s, top_i = jax.lax.top_k(masked, k)
        a_idx = top_i // c_m1
        cls = top_i % c_m1 + 1  # 1-based labels (inference.py:118)
        boxes = B.decode_boxes(
            reg[a_idx].astype(jnp.float32), anchors[a_idx],
            weights=(10.0, 10.0, 5.0, 5.0),
        )
        boxes = B.clip_boxes_dynamic(boxes, size_hw)
        cand_boxes.append(boxes)
        cand_scores.append(top_s)
        cand_labels.append(cls)
        cand_valid.append(top_s > pre_nms_thresh)

    boxes = jnp.concatenate(cand_boxes, axis=0)
    scores = jnp.concatenate(cand_scores, axis=0)
    labels = jnp.concatenate(cand_labels, axis=0).astype(jnp.int32)
    valid = jnp.concatenate(cand_valid, axis=0)

    # per-class NMS via the class-offset trick: shifting each class's boxes
    # by a disjoint coordinate block makes one NMS pass exactly equivalent
    # to per-class NMS (select_over_all_levels, inference.py:132-160), and
    # the NMS emits survivors in descending score order, so its first
    # `detections_per_img` ARE the reference's cross-class score cap.
    span = jnp.maximum(size_hw[0], size_hw[1]).astype(jnp.float32) + 2.0
    offset = labels.astype(jnp.float32)[:, None] * span
    keep_idx, keep_valid = nms_padded(
        boxes + offset, scores, valid, iou_threshold=nms_thresh,
        max_output=detections_per_img,
    )
    return boxes[keep_idx], scores[keep_idx], labels[keep_idx], keep_valid


def retinanet_postprocess(
    logits,  # list per level: [B, h, w, A*(C-1)]
    bbox_reg,  # list per level: [B, h, w, A*4]
    anchors_per_level,  # list per level: [N_l, 4]
    sizes_hw,  # [B, 2]
    num_classes: int,
    pre_nms_thresh: float = 0.05,
    pre_nms_top_n: int = 1000,
    nms_thresh: float = 0.4,
    detections_per_img: int = 100,
):
    """Static-shape RetinaNet inference (reference retinanet/inference.py:
    14-194; defaults from config RETINANET.INFERENCE_TH/.PRE_NMS_TOP_N/
    .NMS_TH + TEST.DETECTIONS_PER_IMG).  Returns a Detections pytree like
    postprocess_detections."""
    from .postprocess import Detections

    c_m1 = num_classes - 1
    b = sizes_hw.shape[0]
    scores_pl, reg_pl = [], []
    for l, r in zip(logits, bbox_reg):
        fl, fb = flatten_retinanet_outputs([l], [r], c_m1)
        scores_pl.append(jax.nn.sigmoid(fl.astype(jnp.float32)))
        reg_pl.append(fb)

    def one(i):
        return _retinanet_postprocess_single(
            [s[i] for s in scores_pl], [r[i] for r in reg_pl],
            anchors_per_level, sizes_hw[i],
            pre_nms_thresh=pre_nms_thresh, pre_nms_top_n=pre_nms_top_n,
            nms_thresh=nms_thresh, detections_per_img=detections_per_img,
        )

    boxes, scores, labels, valid = jax.vmap(one)(jnp.arange(b))
    return Detections(boxes, scores, labels, valid)


class RetinaNetDetector(nn.Module):
    """Single-stage detector: ResNet-FPN pyramid → shared RetinaNet head
    (reference modeling/rpn/retinanet/retinanet.py RetinaNetModule wrapped
    by GeneralizedRCNN with RETINANET_ON; the roi_heads stage is empty).

    Methods mirror FasterRCNN's apply surface where it makes sense:
    __call__ returns per-level (logits, bbox_reg); ``pyramid`` exposes the
    FPN features.
    """

    num_classes: int
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    scales_per_octave: int = 3
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    backbone_stages: tuple = (3, 4, 6, 3)
    width_per_group: int = 64
    res2_out_channels: int = 256
    dtype: Any = jnp.float32

    is_retinanet: bool = True  # engine dispatch flag (train.py / inference.py)

    def setup(self):
        from .backbone import ResNetFPNBackbone

        self.backbone_net = ResNetFPNBackbone(
            stages=self.backbone_stages,
            width_per_group=self.width_per_group,
            res2_out_channels=self.res2_out_channels,
            fpn_out_channels=self.channels,
            top_block="p6p7",  # P6/P7 convs on C5 (USE_C5, reference fpn.py:80-99)
            dtype=self.dtype,
            name="backbone",
        )
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.anchor_ratios) * self.scales_per_octave,
            num_convs=self.num_convs,
            channels=self.channels,
            prior_prob=self.prior_prob,
            dtype=self.dtype,
            name="head",
        )

    def pyramid(self, pixels):
        feats, _ = self.backbone_net(pixels)
        # RetinaNet uses P3..P7 (strides 8..128): drop P2 from the FPN's
        # [P2, P3, P4, P5, P6, P7]
        return feats[1:]

    def __call__(self, pixels):
        feats = self.pyramid(pixels)
        return self.head(feats)


def build_retinanet(cfg):
    r = cfg.MODEL.RETINANET
    stages = tuple(cfg.TPU.get("BACKBONE_STAGES", (3, 4, 6, 3)))
    if len(stages) == 3:  # C4 configs list 3 stages; FPN needs C2..C5
        stages = stages + (stages[-1],)
    return RetinaNetDetector(
        num_classes=int(r.NUM_CLASSES),
        anchor_ratios=tuple(r.ASPECT_RATIOS),
        scales_per_octave=int(r.SCALES_PER_OCTAVE),
        num_convs=int(r.NUM_CONVS),
        channels=int(cfg.TPU.get("RETINANET_CHANNELS", 256)),
        prior_prob=float(r.PRIOR_PROB),
        backbone_stages=stages,
        width_per_group=int(cfg.MODEL.RESNETS.WIDTH_PER_GROUP),
        res2_out_channels=int(cfg.MODEL.RESNETS.RES2_OUT_CHANNELS),
    )
