"""Backbone factory (reference: modeling/backbone/backbone.py:12-61 —
registry dispatch over CONV_BODY; R-50-C4 plus the FPN variants)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNetC4, R50_STAGES, R101_STAGES
from .fpn import FPN


class ResNetFPNBackbone(nn.Module):
    """Stem + stages 1-4 + FPN → [P2..P6] with out_channels=256."""

    stages: tuple = R50_STAGES
    width_per_group: int = 64
    res2_out_channels: int = 256
    fpn_out_channels: int = 256
    top_block: str = "maxpool"
    dtype: Any = jnp.float32
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

    @nn.compact
    def __call__(self, x):
        body = ResNetC4(
            stages=self.stages,
            width_per_group=self.width_per_group,
            res2_out_channels=self.res2_out_channels,
            dtype=self.dtype,
            freeze_at=self.freeze_at,
            freeze_all=self.freeze_all,
            num_groups=self.num_groups,
            stride_in_1x1=self.stride_in_1x1,
            stem_out_channels=self.stem_out_channels,
            norm=self.norm,
            stage_with_dcn=tuple(self.stage_with_dcn),
            modulated_dcn=self.modulated_dcn,
            dcn_groups=self.dcn_groups,
            gn=self.gn,
            name="body",
        )
        _, backbone_features = body(x)  # [C2, C3, C4, C5]
        pyramid = FPN(
            out_channels=self.fpn_out_channels,
            top_block=self.top_block,
            dtype=self.dtype,
            use_gn=self.fpn_use_gn,
            use_relu=self.fpn_use_relu,
            gn=self.gn,
            name="fpn",
        )(backbone_features)
        return pyramid, backbone_features


def build_backbone_module(cfg):
    """CONV_BODY string → module (reference backbone.py registries)."""
    body = str(cfg.MODEL.BACKBONE.CONV_BODY)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        str(cfg.TPU.COMPUTE_DTYPE)
    ]
    freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
    freeze_all = bool(cfg.MODEL.BACKBONE.FREEZE)
    resnet_kw = dict(
        num_groups=int(cfg.MODEL.RESNETS.NUM_GROUPS),
        stride_in_1x1=bool(cfg.MODEL.RESNETS.STRIDE_IN_1X1),
        stem_out_channels=int(cfg.MODEL.RESNETS.get("STEM_OUT_CHANNELS", 64)),
    )
    if body in ("R-50-C4", "R-50-C5"):
        return ResNetC4(
            stages=tuple(cfg.TPU.BACKBONE_STAGES),
            width_per_group=int(cfg.MODEL.RESNETS.WIDTH_PER_GROUP),
            res2_out_channels=int(cfg.MODEL.RESNETS.RES2_OUT_CHANNELS),
            dtype=dtype,
            freeze_at=freeze_at,
            freeze_all=freeze_all,
            **resnet_kw,
        )
    if body == "R-101-C4":
        return ResNetC4(
            stages=R101_STAGES[:3],
            width_per_group=int(cfg.MODEL.RESNETS.WIDTH_PER_GROUP),
            res2_out_channels=int(cfg.MODEL.RESNETS.RES2_OUT_CHANNELS),
            dtype=dtype,
            freeze_at=freeze_at,
            freeze_all=freeze_all,
            **resnet_kw,
        )
    if body in ("R-50-FPN", "R-101-FPN", "R-50-FPN-RETINANET", "R-101-FPN-RETINANET"):
        stages = R101_STAGES if "101" in body else R50_STAGES
        return ResNetFPNBackbone(
            stages=stages,
            width_per_group=int(cfg.MODEL.RESNETS.WIDTH_PER_GROUP),
            res2_out_channels=int(cfg.MODEL.RESNETS.RES2_OUT_CHANNELS),
            fpn_out_channels=int(cfg.MODEL.RESNETS.get("BACKBONE_OUT_CHANNELS", 256)),
            top_block="p6p7" if "RETINANET" in body else "maxpool",
            dtype=dtype,
            freeze_at=freeze_at,
            freeze_all=freeze_all,
            fpn_use_gn=bool(cfg.MODEL.FPN.get("USE_GN", False)),
            fpn_use_relu=bool(cfg.MODEL.FPN.get("USE_RELU", False)),
            **resnet_kw,
        )
    raise ValueError(f"unknown CONV_BODY {body!r}")
