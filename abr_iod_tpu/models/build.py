"""Config → model construction (reference: modeling/detector/detectors.py
build_detection_model; only GeneralizedRCNN is registered there)."""

from __future__ import annotations

import jax.numpy as jnp

from .detector import FasterRCNN

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _gn_tuple(cfg):
    """MODEL.GROUP_NORM.* → (num_groups, dim_per_gp, epsilon)."""
    g = cfg.MODEL.get("GROUP_NORM", None)
    if g is None:
        return (32, -1, 1e-5)
    return (int(g.NUM_GROUPS), int(g.DIM_PER_GP), float(g.EPSILON))


def _trans_func_norm(trans_func: str) -> str:
    """TRANS_FUNC registry (reference resnet.py:5-14) → norm kind."""
    table = {
        "BottleneckWithFixedBatchNorm": "frozen_bn",
        "BottleneckWithGN": "gn",
    }
    if trans_func not in table:
        raise ValueError(
            f"unknown MODEL.RESNETS.TRANS_FUNC {trans_func!r} "
            f"(supported: {sorted(table)})"
        )
    return table[trans_func]


def build_detection_model(cfg):
    if cfg.MODEL.META_ARCHITECTURE != "GeneralizedRCNN":
        raise ValueError(
            f"unknown META_ARCHITECTURE {cfg.MODEL.META_ARCHITECTURE!r}"
        )
    from ..ops.nms import set_nms_backend

    set_nms_backend(str(cfg.TPU.get("NMS_BACKEND", "auto")))
    if bool(cfg.MODEL.RETINANET_ON):
        # RETINANET_ON swaps the RPN+RoI stages for the single-stage
        # RetinaNet module (reference rpn/rpn.py build_rpn:157-160)
        from .retinanet import build_retinanet

        return build_retinanet(cfg)
    body = str(cfg.MODEL.BACKBONE.CONV_BODY)
    if "FPN" in body and not body.startswith("FBNet"):
        # GeneralizedRCNN + R-50/101-FPN (reference backbone registry)
        from .fpn_detector import build_fpn_detector

        return build_fpn_detector(cfg)
    if str(cfg.MODEL.BACKBONE.CONV_BODY).startswith("FBNet"):
        # FBNet trunk + FBNet rpn/bbox heads (reference backbone registry,
        # fbnet.py add_conv_body/add_rpn_head/add_roi_head)
        from .fbnet import build_fbnet_detector

        return build_fbnet_detector(cfg)
    if body not in ("R-50-C4", "R-50-C5", "R-101-C4"):
        raise ValueError(
            f"unknown MODEL.BACKBONE.CONV_BODY {body!r} for GeneralizedRCNN"
        )
    num_anchors = len(tuple(cfg.MODEL.RPN.ANCHOR_SIZES)) * len(
        tuple(cfg.MODEL.RPN.ASPECT_RATIOS)
    )
    bh = cfg.MODEL.ROI_BOX_HEAD
    sampling_ratio = int(bh.POOLER_SAMPLING_RATIO)
    if sampling_ratio < 0:
        raise ValueError(
            f"POOLER_SAMPLING_RATIO={sampling_ratio} is invalid; use 0 "
            "(adaptive ceil(roi/bin) grid, reference ROIAlign_cuda.cu:76-80) "
            "or a positive fixed grid (the shipped recipes use 2)"
        )
    return FasterRCNN(
        num_classes=int(cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES),
        num_anchors=num_anchors,
        mask_on=bool(cfg.MODEL.MASK_ON),
        keypoint_on=bool(cfg.MODEL.KEYPOINT_ON),
        backbone_stages=tuple(cfg.TPU.BACKBONE_STAGES),
        width_per_group=int(cfg.MODEL.RESNETS.WIDTH_PER_GROUP),
        res2_out_channels=int(cfg.MODEL.RESNETS.RES2_OUT_CHANNELS),
        res5_blocks=int(cfg.TPU.RES5_BLOCKS),
        res5_bottleneck=int(cfg.TPU.RES5_BOTTLENECK),
        res5_out=int(cfg.TPU.RES5_OUT),
        dtype=_DTYPES[str(cfg.TPU.COMPUTE_DTYPE)],
        roi_align_precision=str(cfg.TPU.ROI_ALIGN_PRECISION),
        use_pallas_roi_align=bool(cfg.TPU.get("USE_PALLAS_ROI_ALIGN", False)),
        scan_blocks=bool(cfg.TPU.get("SCAN_BLOCKS", False)),
        roi_chunk=int(cfg.TPU.get("ROI_CHUNK", 128)),
        roi_head_chunk=int(cfg.TPU.get("ROI_HEAD_CHUNK", 0)),
        pooler_resolution=int(bh.POOLER_RESOLUTION),
        pooler_scale=float(tuple(bh.POOLER_SCALES)[0]),
        pooler_sampling_ratio=sampling_ratio,
        cls_agnostic_bbox_reg=bool(cfg.MODEL.CLS_AGNOSTIC_BBOX_REG),
        rpn_only=bool(cfg.MODEL.RPN_ONLY),
        freeze_at=int(cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT),
        freeze_backbone=bool(cfg.MODEL.BACKBONE.FREEZE)
        or bool(cfg.MODEL.BACKBONE.get("ALL_FREEZE", False)),
        norm=_trans_func_norm(str(cfg.MODEL.RESNETS.get("TRANS_FUNC",
                                                        "BottleneckWithFixedBatchNorm"))),
        stage_with_dcn=tuple(bool(b) for b in
                             cfg.MODEL.RESNETS.get("STAGE_WITH_DCN",
                                                   (False, False, False, False))),
        modulated_dcn=bool(cfg.MODEL.RESNETS.get("WITH_MODULATED_DCN", False)),
        dcn_groups=int(cfg.MODEL.RESNETS.get("DEFORMABLE_GROUPS", 1)),
        num_groups=int(cfg.MODEL.RESNETS.NUM_GROUPS),
        gn=_gn_tuple(cfg),
        mask_predictor_name=str(cfg.MODEL.ROI_MASK_HEAD.get(
            "PREDICTOR", "MaskRCNNC4Predictor")),
        keypoint_conv_layers=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.get(
            "CONV_LAYERS", tuple(512 for _ in range(8)))),
        num_keypoints=int(cfg.MODEL.ROI_KEYPOINT_HEAD.get("NUM_CLASSES", 17)),
        stride_in_1x1=bool(cfg.MODEL.RESNETS.STRIDE_IN_1X1),
        res5_dilation=int(cfg.MODEL.RESNETS.get("RES5_DILATION", 1)),
        stem_out_channels=int(cfg.MODEL.RESNETS.get("STEM_OUT_CHANNELS", 64)),
    )
