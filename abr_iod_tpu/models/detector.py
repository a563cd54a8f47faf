"""Faster R-CNN R-50-C4 detector (the reference's GeneralizedRCNN,
modeling/detector/generalized_rcnn.py, re-shaped for JAX).

The linen module exposes the three pure NN stages; all control flow
(proposal selection, matching/sampling, losses, teacher APIs) lives in
pure functions (engine/) so each piece is jit/vmap-friendly and
independently testable:

  * ``backbone``  — pixels → C4 features (+ per-stage maps)
  * ``rpn``       — features → (objectness, box deltas)
  * ``roi_heads`` — (features, rois) → (class logits, box deltas,
                     pooled RoI features)

Method names mirror the reference APIs they replace
(generalized_rcnn.py:50,121,169,205) for easy parity checking.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNetC4
from .rpn import RPNHead
from .box_head import RoiBoxHead


class FasterRCNN(nn.Module):
    num_classes: int  # includes background (VOC 15-5 first task: 16)
    num_anchors: int = 15
    # backbone/head size knobs (defaults = R-50-C4; shrink for unit tests)
    backbone_stages: tuple = (3, 4, 6)
    width_per_group: int = 64
    res2_out_channels: int = 256
    res5_blocks: int = 3
    res5_bottleneck: int = 512
    res5_out: int = 2048
    dtype: Any = jnp.float32
    roi_align_precision: str = "default"

    def setup(self):
        self.backbone_net = ResNetC4(
            stages=self.backbone_stages,
            width_per_group=self.width_per_group,
            res2_out_channels=self.res2_out_channels,
            dtype=self.dtype,
            name="backbone",
        )
        self.rpn_head = RPNHead(
            num_anchors=self.num_anchors, dtype=self.dtype, name="rpn"
        )
        self.box_head = RoiBoxHead(
            num_classes=self.num_classes,
            res5_blocks=self.res5_blocks,
            res5_bottleneck=self.res5_bottleneck,
            res5_out=self.res5_out,
            dtype=self.dtype,
            roi_align_precision=self.roi_align_precision,
            name="roi_heads",
        )

    def backbone(self, pixels):
        return self.backbone_net(pixels)

    def rpn(self, features):
        return self.rpn_head(features)

    def roi_heads(self, features, rois):
        return self.box_head(features, rois)

    def __call__(self, pixels, rois):
        """Init/inspection path: full forward over given rois."""
        features, backbone_feats = self.backbone_net(pixels)
        objectness, box_deltas = self.rpn_head(features)
        cls_logits, box_reg, roi_feats, head_feats = self.box_head(features, rois)
        return {
            "features": features,
            "objectness": objectness,
            "rpn_box_deltas": box_deltas,
            "cls_logits": cls_logits,
            "box_reg": box_reg,
            "roi_features": roi_feats,
        }
