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
from .mask_head import MaskRCNNC4Predictor, MaskRCNNConv1x1Predictor
from .keypoint_head import KeypointRCNNFeatureExtractor, KeypointRCNNPredictor


class FasterRCNN(nn.Module):
    num_classes: int  # includes background (VOC 15-5 first task: 16)
    num_anchors: int = 15
    mask_on: bool = False  # Mask R-CNN variant (reference MODEL.MASK_ON)
    keypoint_on: bool = False  # Keypoint R-CNN variant
    # backbone/head size knobs (defaults = R-50-C4; shrink for unit tests)
    backbone_stages: tuple = (3, 4, 6)
    width_per_group: int = 64
    res2_out_channels: int = 256
    res5_blocks: int = 3
    res5_bottleneck: int = 512
    res5_out: int = 2048
    dtype: Any = jnp.float32
    roi_align_precision: str = "default"
    use_pallas_roi_align: bool = False
    scan_blocks: bool = False
    roi_chunk: int = 128
    roi_head_chunk: int = 0  # TPU.ROI_HEAD_CHUNK (see box_head.py)
    # frozen-prefix stop_gradient (MODEL.BACKBONE.FREEZE_CONV_BODY_AT /
    # MODEL.BACKBONE.FREEZE) — must mirror solver/optim.py's masks
    freeze_at: int = 0
    freeze_backbone: bool = False
    # TRANS_FUNC / STAGE_WITH_DCN surface (reference resnet.py:92,110-123)
    norm: str = "frozen_bn"
    stage_with_dcn: tuple = (False, False, False, False)
    modulated_dcn: bool = False
    dcn_groups: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    stem_out_channels: int = 64
    gn: tuple = (32, -1, 1e-5)  # MODEL.GROUP_NORM.*
    # RoI pooler geometry (cfg.MODEL.ROI_BOX_HEAD.POOLER_*)
    pooler_resolution: int = 7
    pooler_scale: float = 1.0 / 16
    pooler_sampling_ratio: int = 2
    # mask/keypoint head knobs (MODEL.ROI_MASK_HEAD / ROI_KEYPOINT_HEAD)
    cls_agnostic_bbox_reg: bool = False
    rpn_only: bool = False  # MODEL.RPN_ONLY (generalized_rcnn.py:50-119)
    mask_predictor_name: str = "MaskRCNNC4Predictor"
    keypoint_conv_layers: tuple = tuple(512 for _ in range(8))
    num_keypoints: int = 17

    def setup(self):
        self.backbone_net = ResNetC4(
            stages=self.backbone_stages,
            width_per_group=self.width_per_group,
            res2_out_channels=self.res2_out_channels,
            dtype=self.dtype,
            scan_blocks=self.scan_blocks,
            freeze_at=self.freeze_at,
            freeze_all=self.freeze_backbone,
            norm=self.norm,
            stage_with_dcn=tuple(self.stage_with_dcn),
            modulated_dcn=self.modulated_dcn,
            dcn_groups=self.dcn_groups,
            num_groups=self.num_groups,
            stride_in_1x1=self.stride_in_1x1,
            stem_out_channels=self.stem_out_channels,
            gn=self.gn,
            name="backbone",
        )
        self.rpn_head = RPNHead(
            num_anchors=self.num_anchors, dtype=self.dtype, name="rpn"
        )
        if self.rpn_only:
            return  # proposal network only: no RoI stages built
        self.box_head = RoiBoxHead(
            num_classes=self.num_classes,
            pooler_resolution=self.pooler_resolution,
            pooler_scale=self.pooler_scale,
            pooler_sampling_ratio=self.pooler_sampling_ratio,
            res5_blocks=self.res5_blocks,
            res5_bottleneck=self.res5_bottleneck,
            res5_out=self.res5_out,
            dtype=self.dtype,
            roi_align_precision=self.roi_align_precision,
            use_pallas_roi_align=self.use_pallas_roi_align,
            roi_chunk=self.roi_chunk,
            roi_head_chunk=self.roi_head_chunk,
            norm=self.norm,
            res5_with_dcn=bool(tuple(self.stage_with_dcn)[3])
            if len(tuple(self.stage_with_dcn)) > 3 else False,
            modulated_dcn=self.modulated_dcn,
            dcn_groups=self.dcn_groups,
            groups=self.num_groups,
            res5_dilation=self.res5_dilation,
            stride_in_1x1=self.stride_in_1x1,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            name="roi_heads",
        )
        if self.mask_on:
            # MODEL.ROI_MASK_HEAD.PREDICTOR dispatch (reference
            # roi_mask_predictors.py:11,36)
            preds = {"MaskRCNNC4Predictor": MaskRCNNC4Predictor,
                     "MaskRCNNConv1x1Predictor": MaskRCNNConv1x1Predictor}
            if self.mask_predictor_name not in preds:
                raise ValueError(
                    f"unknown ROI_MASK_HEAD.PREDICTOR {self.mask_predictor_name!r}"
                )
            self.mask_predictor = preds[self.mask_predictor_name](
                num_classes=self.num_classes, dtype=self.dtype, name="mask_head"
            )
        if self.keypoint_on:
            # reference keypoint branch = extractor conv stack + deconv
            # predictor (roi_keypoint_feature_extractors.py +
            # roi_keypoint_predictors.py)
            self.keypoint_extractor = KeypointRCNNFeatureExtractor(
                layers=tuple(self.keypoint_conv_layers), dtype=self.dtype,
                name="keypoint_fcn",
            )
            self.keypoint_predictor = KeypointRCNNPredictor(
                num_keypoints=self.num_keypoints, dtype=self.dtype,
                name="keypoint_head",
            )

    def backbone(self, pixels):
        return self.backbone_net(pixels)

    def rpn(self, features):
        return self.rpn_head(features)

    def roi_heads(self, features, rois):
        return self.box_head(features, rois)

    def mask_heads(self, features, rois):
        """Mask branch on the shared pooled RoI features (the C4 Mask
        R-CNN layout: the res5 RoI features feed the mask predictor,
        reference roi_heads.py:23-63 + mask_head.py:24-58). Returns mask
        logits [B, S, 2P, 2P, num_classes]."""
        if not self.mask_on:
            raise ValueError("model built without mask_on")
        _, _, roi_feats, _ = self.box_head(features, rois)
        b, s = rois.shape[:2]
        x = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
        logits = self.mask_predictor(x)
        return logits.reshape((b, s) + logits.shape[1:])

    def mask_from_roi_features(self, roi_feats):
        """Mask logits from already-pooled RoI features [B, S, P, P, C] —
        the training path reuses the box branch's pooled features instead
        of re-running RoIAlign (the reference's C4 roi_heads share the
        feature extractor the same way, roi_heads.py:23-63)."""
        if not self.mask_on:
            raise ValueError("model built without mask_on")
        b, s = roi_feats.shape[:2]
        x = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
        logits = self.mask_predictor(x)
        return logits.reshape((b, s) + logits.shape[1:])

    def keypoints_from_roi_features(self, roi_feats):
        """Keypoint logits from already-pooled RoI features."""
        if not self.keypoint_on:
            raise ValueError("model built without keypoint_on")
        b, s = roi_feats.shape[:2]
        x = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
        heat = self.keypoint_predictor(self.keypoint_extractor(x))
        return heat.reshape((b, s) + heat.shape[1:])

    def keypoint_heads(self, features, rois):
        """Keypoint branch (reference keypoint_head.py:9-50)."""
        if not self.keypoint_on:
            raise ValueError("model built without keypoint_on")
        _, _, roi_feats, _ = self.box_head(features, rois)
        b, s = rois.shape[:2]
        x = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
        heat = self.keypoint_predictor(self.keypoint_extractor(x))
        return heat.reshape((b, s) + heat.shape[1:])

    def __call__(self, pixels, rois):
        """Init/inspection path: full forward over given rois."""
        features, backbone_feats = self.backbone_net(pixels)
        objectness, box_deltas = self.rpn_head(features)
        if self.rpn_only:
            return {"features": features, "objectness": objectness,
                    "rpn_box_deltas": box_deltas}
        cls_logits, box_reg, roi_feats, head_feats = self.box_head(features, rois)
        out = {
            "features": features,
            "objectness": objectness,
            "rpn_box_deltas": box_deltas,
            "cls_logits": cls_logits,
            "box_reg": box_reg,
            "roi_features": roi_feats,
        }
        b, s = rois.shape[:2]
        if self.mask_on:
            x = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
            m = self.mask_predictor(x)
            out["mask_logits"] = m.reshape((b, s) + m.shape[1:])
        if self.keypoint_on:
            x = roi_feats.reshape((b * s,) + roi_feats.shape[2:])
            k = self.keypoint_predictor(self.keypoint_extractor(x))
            out["keypoint_logits"] = k.reshape((b, s) + k.shape[1:])
        return out
