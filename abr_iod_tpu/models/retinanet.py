"""RetinaNet (reference: modeling/rpn/retinanet/{retinanet,loss,
inference}.py — registered in the reference but unused by the shipped
ABR configs; kept for model-family completeness).

Head: NUM_CONVS=4 shared conv towers → A*(num_classes-1) cls logits with
prior-prob bias init (-log((1-p)/p), p=.01) + A*4 box deltas per FPN
level.  Loss: sigmoid focal (γ=2, α=.25) over anchors matched at .5/.4
with low-quality recovery, smooth-L1(β=.11) on positives.  Inference:
per-level score threshold + top-k → decode → per-class NMS(.4).
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
                   reg_weight=4.0):
    """cls_logits [B,N,C-1], box_reg [B,N,4], anchors [N,4]
    (reference retinanet/loss.py)."""

    def one(logits, reg, boxes, labels, mask):
        quality = B.masked_iou(boxes, mask, anchors, jnp.ones(anchors.shape[0], bool))
        res = M.match(quality, mask, fg_iou, bg_iou, allow_low_quality_matches=True)
        t_labels = labels[res.matched_gt].astype(jnp.int32)
        t_labels = jnp.where(res.matched_idx == M.BELOW_LOW_THRESHOLD, 0, t_labels)
        t_labels = jnp.where(res.matched_idx == M.BETWEEN_THRESHOLDS, -1, t_labels)
        pos = t_labels > 0

        cls = sigmoid_focal_loss(logits, t_labels, gamma=gamma, alpha=alpha).sum()
        reg_targets = B.encode_boxes(boxes[res.matched_gt], anchors,
                                     weights=(1.0, 1.0, 1.0, 1.0))
        reg_l = smooth_l1_loss(reg, reg_targets, beta=beta).sum(-1)
        n_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        return cls / (n_pos * max(1, logits.shape[-1])), jnp.sum(
            jnp.where(pos, reg_l, 0.0)
        ) / (n_pos * reg_weight)

    cls_l, reg_l = jax.vmap(one)(cls_logits, box_reg, gt_boxes, gt_labels, gt_mask)
    return jnp.mean(cls_l), jnp.mean(reg_l)
