"""Faster R-CNN with an FPN backbone (the reference's GeneralizedRCNN +
R-50-FPN registry path: modeling/backbone/backbone.py:23-43 +
rpn/rpn.py USE_FPN + roi_heads FPN extractors).

The shipped ABR recipes are all C4; this family exists because the
reference's registry supports it and a user switching frameworks should
find it.  Structure mirrors FasterRCNN (detector.py): pure NN stages as
methods, all control flow in engine/fpn.py.

  * ``backbone``  — pixels → (P2..P6 pyramid, per-stage C maps)
  * ``rpn``       — pyramid → [(objectness, deltas)] per level, SHARED
                    head weights (reference rpn.py:188 uses one head for
                    all levels)
  * ``roi_heads`` — (pyramid, rois) → (logits, box reg, pooled feats)
                    via the FPN box head (2-MLP or Xconv1fc)
  * ``mask_heads``— (pyramid, rois) → mask logits via the FPN mask
                    extractor + C4 predictor (MaskRCNNFPNFeatureExtractor,
                    roi_mask_feature_extractors.py:17-68)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbone import ResNetFPNBackbone
from .fpn import fpn_roi_align_batched
from .fpn_box_head import FPNBoxHead
from .keypoint_head import KeypointRCNNFeatureExtractor, KeypointRCNNPredictor
from .mask_head import MaskRCNNC4Predictor, MaskRCNNFPNFeatureExtractor
from .resnet import R50_STAGES
from .rpn import RPNHead

# P2..P6 strides for the standard FPN detector
FPN_STRIDES = (4, 8, 16, 32, 64)


class FasterRCNNFPN(nn.Module):
    num_classes: int
    num_anchors: int = 3  # per location per level: len(ASPECT_RATIOS)
    mask_on: bool = False
    keypoint_on: bool = False
    keypoint_conv_layers: tuple = tuple(512 for _ in range(8))
    num_keypoints: int = 17
    stages: tuple = R50_STAGES
    width_per_group: int = 64
    res2_out_channels: int = 256
    fpn_out_channels: int = 256
    representation_size: int = 1024  # MLP_HEAD_DIM
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 2
    mask_pooler_resolution: int = 14
    mask_pooler_sampling_ratio: int = 2
    keypoint_pooler_resolution: int = 14
    keypoint_pooler_sampling_ratio: int = 2
    mask_conv_layers: tuple = (256, 256, 256, 256)
    cls_agnostic_bbox_reg: bool = False  # MODEL.CLS_AGNOSTIC_BBOX_REG
    rpn_only: bool = False  # MODEL.RPN_ONLY (engine/fpn.py dispatch)
    extractor: str = "FPN2MLPFeatureExtractor"
    use_gn: bool = False
    conv_head_dim: int = 256
    num_stacked_convs: int = 4
    xconv_dilation: int = 1
    dtype: Any = jnp.float32
    # TPU.ROI_ALIGN_PRECISION for every multi-level pool (box/mask/
    # keypoint) — same knob the C4 family honors (models/detector.py:45)
    roi_align_precision: str = "default"
    # TPU.FPN_ROI_ALIGN_BACKEND for every multi-level pool
    # (models/fpn.py fpn_roi_align dispatch: einsum | gather | default)
    roi_align_backend: str = "default"
    freeze_at: int = 0
    freeze_all: bool = False
    fpn_use_gn: bool = False
    fpn_use_relu: bool = False
    num_groups: int = 1
    stride_in_1x1: bool = True
    stem_out_channels: int = 64
    norm: str = "frozen_bn"  # TRANS_FUNC
    stage_with_dcn: tuple = (False, False, False, False)
    modulated_dcn: bool = False
    dcn_groups: int = 1
    gn: tuple = (32, -1, 1e-5)  # MODEL.GROUP_NORM.*

    is_fpn: bool = True  # engine dispatch flag (train.py / inference.py)

    def setup(self):
        self.backbone_net = ResNetFPNBackbone(
            stages=tuple(self.stages),
            width_per_group=self.width_per_group,
            res2_out_channels=self.res2_out_channels,
            fpn_out_channels=self.fpn_out_channels,
            top_block="maxpool",
            dtype=self.dtype,
            freeze_at=self.freeze_at,
            freeze_all=self.freeze_all,
            fpn_use_gn=self.fpn_use_gn,
            fpn_use_relu=self.fpn_use_relu,
            num_groups=self.num_groups,
            stride_in_1x1=self.stride_in_1x1,
            stem_out_channels=self.stem_out_channels,
            norm=self.norm,
            stage_with_dcn=tuple(self.stage_with_dcn),
            modulated_dcn=self.modulated_dcn,
            dcn_groups=self.dcn_groups,
            gn=self.gn,
            name="backbone",
        )
        self.rpn_head = RPNHead(
            num_anchors=self.num_anchors, dtype=self.dtype, name="rpn"
        )
        if self.rpn_only:
            return  # proposal network only: no RoI stages built (like C4)
        self.box_head = FPNBoxHead(
            num_classes=self.num_classes,
            representation_size=self.representation_size,
            pooler_resolution=self.pooler_resolution,
            pooler_scales=tuple(1.0 / s for s in FPN_STRIDES[:4]),
            pooler_sampling_ratio=self.pooler_sampling_ratio,
            dtype=self.dtype,
            extractor=self.extractor,
            use_gn=self.use_gn,
            conv_head_dim=self.conv_head_dim,
            num_stacked_convs=self.num_stacked_convs,
            dilation=self.xconv_dilation,
            gn=self.gn,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            roi_align_precision=self.roi_align_precision,
            roi_align_backend=self.roi_align_backend,
            name="roi_heads",
        )
        if self.mask_on:
            self.mask_extractor = MaskRCNNFPNFeatureExtractor(
                layers=tuple(self.mask_conv_layers), dtype=self.dtype,
                name="mask_fcn",
            )
            self.mask_predictor = MaskRCNNC4Predictor(
                num_classes=self.num_classes, dtype=self.dtype, name="mask_head"
            )
        if self.keypoint_on:
            self.keypoint_extractor = KeypointRCNNFeatureExtractor(
                layers=tuple(self.keypoint_conv_layers), dtype=self.dtype,
                name="keypoint_fcn",
            )
            self.keypoint_predictor = KeypointRCNNPredictor(
                num_keypoints=self.num_keypoints, dtype=self.dtype,
                name="keypoint_head",
            )

    def backbone(self, pixels):
        pyramid, backbone_feats = self.backbone_net(pixels)
        return tuple(pyramid), tuple(backbone_feats)

    def rpn(self, pyramid):
        """Shared RPN head over every level (reference rpn.py:114-129)."""
        return tuple(self.rpn_head(f) for f in pyramid)

    def roi_heads(self, pyramid, rois):
        logits, box_reg, pool = self.box_head(list(pyramid), rois)
        return logits, box_reg, pool, None

    def mask_heads(self, pyramid, rois):
        """FPN mask branch: its own 14x14 multi-level pool → conv stack →
        deconv predictor (reference mask FPN path)."""
        if not self.mask_on:
            raise ValueError("model built without mask_on")
        b, s = rois.shape[:2]
        pool = fpn_roi_align_batched(
            list(pyramid)[:4], rois,
            output_size=self.mask_pooler_resolution,
            scales=tuple(1.0 / st for st in FPN_STRIDES[:4]),
            sampling_ratio=self.mask_pooler_sampling_ratio,
            precision=self.roi_align_precision,
            backend=self.roi_align_backend,
        )
        x = pool.reshape((b * s,) + pool.shape[2:])
        logits = self.mask_predictor(self.mask_extractor(x))
        return logits.reshape((b, s) + logits.shape[1:])

    def keypoint_heads(self, pyramid, rois):
        """FPN keypoint branch (the reference's Keypoint R-CNN layout:
        own 14x14 pool → conv stack → deconv predictor)."""
        if not self.keypoint_on:
            raise ValueError("model built without keypoint_on")
        b, s = rois.shape[:2]
        pool = fpn_roi_align_batched(
            list(pyramid)[:4], rois,
            output_size=self.keypoint_pooler_resolution,
            scales=tuple(1.0 / st for st in FPN_STRIDES[:4]),
            sampling_ratio=self.keypoint_pooler_sampling_ratio,
            precision=self.roi_align_precision,
            backend=self.roi_align_backend,
        )
        x = pool.reshape((b * s,) + pool.shape[2:])
        heat = self.keypoint_predictor(self.keypoint_extractor(x))
        return heat.reshape((b, s) + heat.shape[1:])

    def __call__(self, pixels, rois):
        """Init/inspection path."""
        pyramid, _ = self.backbone(pixels)
        rpn_outs = self.rpn(pyramid)
        if self.rpn_only:
            return {
                "pyramid_shapes": tuple(p.shape for p in pyramid),
                "objectness": tuple(o for o, _ in rpn_outs),
            }
        cls_logits, box_reg, pool, _ = self.roi_heads(pyramid, rois)
        out = {
            "pyramid_shapes": tuple(p.shape for p in pyramid),
            "objectness": tuple(o for o, _ in rpn_outs),
            "cls_logits": cls_logits,
            "box_reg": box_reg,
            "roi_features": pool,
        }
        if self.mask_on:
            out["mask_logits"] = self.mask_heads(pyramid, rois)
        if self.keypoint_on:
            out["keypoint_logits"] = self.keypoint_heads(pyramid, rois)
        return out


def build_fpn_detector(cfg):
    from .build import _DTYPES, _gn_tuple, _trans_func_norm

    norm = _trans_func_norm(str(cfg.MODEL.RESNETS.get(
        "TRANS_FUNC", "BottleneckWithFixedBatchNorm")))
    body = str(cfg.MODEL.BACKBONE.CONV_BODY)
    from .resnet import R101_STAGES

    # TPU.FPN_BACKBONE_STAGES: () = derive from CONV_BODY (tests shrink it)
    stages = tuple(cfg.TPU.get("FPN_BACKBONE_STAGES", ())) or (
        R101_STAGES if "101" in body else R50_STAGES
    )
    bh = cfg.MODEL.ROI_BOX_HEAD
    dtype = _DTYPES[str(cfg.TPU.COMPUTE_DTYPE)]
    box_ratio = int(bh.POOLER_SAMPLING_RATIO)
    if box_ratio < 0:
        raise ValueError(
            f"POOLER_SAMPLING_RATIO={box_ratio} is invalid; 0 = adaptive "
            "(reference ROIAlign_cuda.cu:76-80), positive = fixed grid"
        )

    def _aux_ratio(v: int) -> int:
        # 0 = adaptive per-RoI grid (the reference mask/keypoint pooler
        # default), handled natively by ops/roi_align since round 3
        if int(v) < 0:
            raise ValueError(f"POOLER_SAMPLING_RATIO={v} is invalid")
        return int(v)

    return FasterRCNNFPN(
        num_classes=int(bh.NUM_CLASSES),
        num_anchors=len(tuple(cfg.MODEL.RPN.ASPECT_RATIOS)),
        mask_on=bool(cfg.MODEL.MASK_ON),
        keypoint_on=bool(cfg.MODEL.KEYPOINT_ON),
        keypoint_conv_layers=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.get(
            "CONV_LAYERS", tuple(512 for _ in range(8)))),
        num_keypoints=int(cfg.MODEL.ROI_KEYPOINT_HEAD.get("NUM_CLASSES", 17)),
        stages=stages,
        width_per_group=int(cfg.MODEL.RESNETS.WIDTH_PER_GROUP),
        res2_out_channels=int(cfg.MODEL.RESNETS.RES2_OUT_CHANNELS),
        fpn_out_channels=int(cfg.MODEL.RESNETS.get("BACKBONE_OUT_CHANNELS", 256)),
        representation_size=int(bh.MLP_HEAD_DIM),
        pooler_resolution=int(bh.POOLER_RESOLUTION),
        pooler_sampling_ratio=box_ratio,
        mask_pooler_resolution=int(cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION),
        mask_pooler_sampling_ratio=_aux_ratio(
            cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO),
        keypoint_pooler_resolution=int(
            cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION),
        keypoint_pooler_sampling_ratio=_aux_ratio(
            cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO),
        cls_agnostic_bbox_reg=bool(cfg.MODEL.CLS_AGNOSTIC_BBOX_REG),
        rpn_only=bool(cfg.MODEL.RPN_ONLY),
        mask_conv_layers=tuple(cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS),
        extractor=str(bh.FEATURE_EXTRACTOR)
        if str(bh.FEATURE_EXTRACTOR).startswith("FPN")
        else "FPN2MLPFeatureExtractor",
        use_gn=bool(bh.USE_GN),
        conv_head_dim=int(bh.CONV_HEAD_DIM),
        num_stacked_convs=int(bh.NUM_STACKED_CONVS),
        xconv_dilation=int(bh.DILATION),
        dtype=dtype,
        roi_align_precision=str(cfg.TPU.ROI_ALIGN_PRECISION),
        roi_align_backend=str(cfg.TPU.get("FPN_ROI_ALIGN_BACKEND", "default")),
        freeze_at=int(cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT),
        freeze_all=bool(cfg.MODEL.BACKBONE.FREEZE)
        or bool(cfg.MODEL.BACKBONE.get("ALL_FREEZE", False)),
        fpn_use_gn=bool(cfg.MODEL.FPN.get("USE_GN", False)),
        fpn_use_relu=bool(cfg.MODEL.FPN.get("USE_RELU", False)),
        num_groups=int(cfg.MODEL.RESNETS.NUM_GROUPS),
        stride_in_1x1=bool(cfg.MODEL.RESNETS.STRIDE_IN_1X1),
        stem_out_channels=int(cfg.MODEL.RESNETS.get("STEM_OUT_CHANNELS", 64)),
        norm=norm,
        stage_with_dcn=tuple(bool(b) for b in cfg.MODEL.RESNETS.get(
            "STAGE_WITH_DCN", (False, False, False, False))),
        modulated_dcn=bool(cfg.MODEL.RESNETS.get("WITH_MODULATED_DCN", False)),
        dcn_groups=int(cfg.MODEL.RESNETS.get("DEFORMABLE_GROUPS", 1)),
        gn=_gn_tuple(cfg),
    )
