"""Detection training losses on padded arrays.

RPN loss mirrors maskrcnn_benchmark/modeling/rpn/loss.py:104-148
(matcher .7/.3 with low-quality recovery, 256@50% balanced sampling,
BCE objectness averaged over sampled anchors, smooth-L1(β=1/9) box loss
summed over positives and divided by the number of sampled anchors,
batch-wide).

RoI box loss mirrors modeling/roi_heads/box_head/loss.py:122-186
(matcher .5/.5, 512@25% sampling happens upstream, CE — or the
Inclusive Classification Loss when dist_type == 'id'
(loss.py:151-159) — plus class-specific smooth-L1(β=1) divided by the
total number of sampled proposals).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..structures import boxes as B
from ..ops.losses import smooth_l1_loss
from . import matcher as M
from . import sampler as S


class RpnTargets(NamedTuple):
    labels: jnp.ndarray  # [B, N] float: 1 pos, 0 neg, -1 discard
    matched_gt: jnp.ndarray  # [B, N] int32 matched gt slot (positives only)


def prepare_rpn_targets(anchors, visibility, gt_boxes, gt_labels, gt_mask):
    """Per-image anchor labeling (reference rpn/loss.py:69-103).

    anchors [N,4]; visibility [B,N] bool; gt_* [B,M,...].  Regression
    targets are NOT materialized here — only sampled positives ever need
    them (rpn_loss encodes the ≤128/img gathered positives; the
    per-anchor [B,N,4] encode was ~2% of the train step).
    """

    def one(vis, boxes, mask):
        quality = B.masked_iou(boxes, mask, anchors, jnp.ones(anchors.shape[0], bool))
        res = M.match(quality, mask, 0.7, 0.3, allow_low_quality_matches=True)
        labels = jnp.where(res.matched_idx >= 0, 1.0, 0.0)
        labels = jnp.where(res.matched_idx == M.BELOW_LOW_THRESHOLD, 0.0, labels)
        labels = jnp.where(~vis, -1.0, labels)
        labels = jnp.where(res.matched_idx == M.BETWEEN_THRESHOLDS, -1.0, labels)
        return labels, res.matched_gt.astype(jnp.int32)

    labels, matched = jax.vmap(one)(visibility, gt_boxes, gt_mask)
    return RpnTargets(labels, matched)


def rpn_loss(objectness, box_regression, rpn_targets: RpnTargets, key,
             batch_size_per_image: int = 256, positive_fraction: float = 0.5,
             anchors=None, gt_boxes=None):
    """objectness [B, N], box_regression [B, N, 4]; anchors [N,4] and
    gt_boxes [B,M,4] for encoding the sampled positives' regression
    targets.  Returns (obj_loss, box_loss)."""
    bsz = objectness.shape[0]
    keys = jax.random.split(key, bsz)
    pos_mask, pos_idx, pos_sel, neg_mask = jax.vmap(
        lambda l, k: S.balanced_sample_with_indices(
            l.astype(jnp.int32), k, batch_size_per_image, positive_fraction
        )
    )(rpn_targets.labels, keys)

    sampled = pos_mask | neg_mask
    num_sampled = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)

    obj = objectness.astype(jnp.float32)
    labels = rpn_targets.labels
    bce = jnp.maximum(obj, 0) - obj * labels + jnp.log1p(jnp.exp(-jnp.abs(obj)))
    obj_loss = jnp.sum(jnp.where(sampled, bce, 0.0)) / num_sampled

    # box loss over the GATHERED sampled positives only (identical math to
    # masking the full per-anchor target array, minus its HBM traffic)
    anchors_pos = anchors[pos_idx]  # [B, max_pos, 4]
    matched_pos = jnp.take_along_axis(rpn_targets.matched_gt, pos_idx, axis=1)
    boxes_pos = jax.vmap(lambda gb, m: gb[m])(gt_boxes, matched_pos)
    reg_t = jax.vmap(
        lambda bx, an: B.encode_boxes(bx, an, weights=(1.0, 1.0, 1.0, 1.0))
    )(boxes_pos, anchors_pos)
    pred_pos = jnp.take_along_axis(
        box_regression.astype(jnp.float32), pos_idx[..., None], axis=1
    )
    box_l = smooth_l1_loss(pred_pos, reg_t, beta=1.0 / 9).sum(-1)
    box_loss = jnp.sum(jnp.where(pos_sel, box_l, 0.0)) / num_sampled
    return obj_loss, box_loss


class RoiTargets(NamedTuple):
    labels: jnp.ndarray  # [B, P] int32: -1 ignore, 0 bg, c>0 class
    reg_targets: jnp.ndarray  # [B, P, 4]
    matched_gt: jnp.ndarray  # [B, P] int32 index of the matched gt slot


def prepare_roi_targets(prop_boxes, prop_valid, gt_boxes, gt_labels, gt_mask,
                        fg_iou: float = 0.5, bg_iou: float = 0.5,
                        bbox_reg_weights=(10.0, 10.0, 5.0, 5.0)):
    """Label proposals against gt (reference box_head/loss.py:43-85).
    Invalid (padded) proposals are labeled -1 so they are never sampled."""

    def one(pboxes, pvalid, boxes, labels_gt, mask):
        quality = B.masked_iou(boxes, mask, pboxes, pvalid)
        res = M.match(quality, mask, fg_iou, bg_iou, allow_low_quality_matches=False)
        labels = labels_gt[res.matched_gt].astype(jnp.int32)
        labels = jnp.where(res.matched_idx == M.BELOW_LOW_THRESHOLD, 0, labels)
        labels = jnp.where(res.matched_idx == M.BETWEEN_THRESHOLDS, -1, labels)
        labels = jnp.where(pvalid, labels, -1)
        reg = B.encode_boxes(boxes[res.matched_gt], pboxes, weights=bbox_reg_weights)
        return labels, reg, res.matched_gt.astype(jnp.int32)

    labels, reg, matched = jax.vmap(one)(
        prop_boxes, prop_valid, gt_boxes, gt_labels, gt_mask
    )
    return RoiTargets(labels, reg, matched)


def subsample_rois(roi_targets: RoiTargets, prop_boxes, key,
                   batch_size_per_image: int = 512, positive_fraction: float = 0.25):
    """Fixed-size RoI subsampling (reference box_head/loss.py:86-120).

    Returns (rois [B,S,4], labels [B,S], reg_targets [B,S,4],
             valid [B,S], is_pos [B,S], matched_gt [B,S]).
    """
    bsz = roi_targets.labels.shape[0]
    keys = jax.random.split(key, bsz)

    def one(labels, reg, matched, boxes, k):
        samp = S.balanced_sample_indices(labels, k, batch_size_per_image, positive_fraction)
        return (
            boxes[samp.idx],
            labels[samp.idx],
            reg[samp.idx],
            samp.valid,
            samp.is_pos,
            matched[samp.idx],
        )

    return jax.vmap(one)(roi_targets.labels, roi_targets.reg_targets,
                         roi_targets.matched_gt, prop_boxes, keys)


def roi_box_loss(class_logits, box_regression, labels, reg_targets, valid,
                 dist_type: str = "none", n_old_classes: int = 0):
    """class_logits [B,S,C], box_regression [B,S,4C], labels [B,S] (pad slots
    may hold stale values — masked by `valid`)."""
    b, s, c = class_logits.shape
    logits = class_logits.reshape(b * s, c).astype(jnp.float32)
    box_reg = box_regression.reshape(b * s, c, 4).astype(jnp.float32)
    labels = jnp.where(valid, labels, 0).reshape(b * s)
    reg_t = reg_targets.reshape(b * s, 4)
    vmask = valid.reshape(b * s)
    num_valid = jnp.maximum(jnp.sum(vmask.astype(jnp.float32)), 1.0)

    if dist_type == "id":
        # Inclusive Classification Loss (reference box_head/loss.py:151-159):
        # fold {bg ∪ old classes} into the background logit via logsumexp
        den = jax.nn.logsumexp(logits, axis=1)
        out_bg = jax.nn.logsumexp(logits[:, : n_old_classes + 1], axis=1) - den
        out_new = logits[:, n_old_classes + 1 :] - den[:, None]
        log_probs = jnp.concatenate(
            [out_bg[:, None], jnp.zeros((b * s, n_old_classes)), out_new], axis=1
        )
        nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
        cls_loss = jnp.sum(jnp.where(vmask, nll, 0.0)) / num_valid
    else:
        logp = jax.nn.log_softmax(logits, axis=1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        cls_loss = jnp.sum(jnp.where(vmask, nll, 0.0)) / num_valid

    # class-specific box regression on positives (box_head/loss.py:166-179)
    pos = vmask & (labels > 0)
    per_class_reg = jnp.take_along_axis(
        box_reg, labels[:, None, None].clip(0), axis=1
    )[:, 0]
    box_l = smooth_l1_loss(per_class_reg, reg_t, beta=1.0).sum(-1)
    box_loss = jnp.sum(jnp.where(pos, box_l, 0.0)) / num_valid
    return cls_loss, box_loss
