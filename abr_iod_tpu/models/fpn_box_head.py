"""FPN-style RoI box head: 2-MLP or Xconv1fc feature extractor + FPN
predictor.

Reference: roi_box_feature_extractors.py FPN2MLPFeatureExtractor
(:58-101 — Pooler(7x7 multi-level) → fc6 → fc7, 1024-d),
FPNXconv1fcFeatureExtractor (:104-163 — N stacked 3x3 convs (+GN) →
fc6), and roi_box_predictors.py FPNPredictor (:35-123 — cls_score +
bbox_pred(4*C), normal init 0.01/0.001).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import fpn_roi_align_batched


class FPNBoxHead(nn.Module):
    num_classes: int
    representation_size: int = 1024
    pooler_resolution: int = 7
    pooler_scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    pooler_sampling_ratio: int = 2
    dtype: Any = jnp.float32
    # extractor dispatch (MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR)
    extractor: str = "FPN2MLPFeatureExtractor"
    # FPNXconv1fc knobs (MODEL.ROI_BOX_HEAD.{USE_GN,CONV_HEAD_DIM,
    # NUM_STACKED_CONVS,DILATION})
    use_gn: bool = False
    conv_head_dim: int = 256
    num_stacked_convs: int = 4
    dilation: int = 1
    gn: tuple = (32, -1, 1e-5)  # MODEL.GROUP_NORM.*
    # MODEL.CLS_AGNOSTIC_BBOX_REG (reference roi_box_predictors.py
    # FPNPredictor: num_bbox_reg_classes = 2 when set)
    cls_agnostic_bbox_reg: bool = False
    # TPU.ROI_ALIGN_PRECISION ('default' = bf16 MXU einsums, 'highest' =
    # f32 — same knob the C4 box head honors, models/box_head.py:32)
    roi_align_precision: str = "default"
    # TPU.FPN_ROI_ALIGN_BACKEND (models/fpn.py fpn_roi_align dispatch)
    roi_align_backend: str = "default"

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], rois: jnp.ndarray):
        """features: P2..P5 [B,h,w,C]; rois [B,S,4] →
        (logits [B,S,K], box_reg [B,S,4K], roi_feats [B,S,P,P,C])."""
        b, s = rois.shape[:2]
        pool = fpn_roi_align_batched(
            features[: len(self.pooler_scales)], rois,
            output_size=self.pooler_resolution,
            scales=self.pooler_scales,
            sampling_ratio=self.pooler_sampling_ratio,
            precision=self.roi_align_precision,
            backend=self.roi_align_backend,
        )
        if self.extractor == "FPNXconv1fcFeatureExtractor":
            x = pool.reshape((b * s,) + pool.shape[2:]).astype(self.dtype)
            d = self.dilation
            for ix in range(self.num_stacked_convs):
                x = nn.Conv(
                    self.conv_head_dim, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=not self.use_gn,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"xconv{ix}",
                )(x)
                if self.use_gn:
                    from .make_layers import group_norm

                    x = group_norm(
                        self.conv_head_dim, num_groups=int(self.gn[0]),
                        dim_per_gp=int(self.gn[1]), epsilon=float(self.gn[2]),
                        dtype=self.dtype, name=f"xconv{ix}_gn",
                    )(x)
                x = nn.relu(x)
            x = x.reshape(b * s, -1)
            x = nn.relu(nn.Dense(self.representation_size, name="fc6",
                                 dtype=self.dtype)(x))
        elif self.extractor == "FPN2MLPFeatureExtractor":
            x = pool.reshape(b * s, -1).astype(self.dtype)
            x = nn.relu(nn.Dense(self.representation_size, name="fc6", dtype=self.dtype)(x))
            x = nn.relu(nn.Dense(self.representation_size, name="fc7", dtype=self.dtype)(x))
        else:
            raise ValueError(f"unknown FPN box feature extractor {self.extractor!r}")
        cls_logits = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="cls_score",
        )(x)
        n_reg = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        box_reg = nn.Dense(
            n_reg * 4, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="bbox_pred",
        )(x)
        if self.cls_agnostic_bbox_reg:
            # fg deltas broadcast over classes (same expansion as the C4
            # box head; reference box_head/inference.py slices [-4:])
            fg = box_reg.reshape(b * s, 2, 4)[:, 1]
            box_reg = jnp.tile(fg[:, None, :], (1, self.num_classes, 1)).reshape(
                b * s, self.num_classes * 4
            )
        return (
            cls_logits.reshape(b, s, -1).astype(jnp.float32),
            box_reg.reshape(b, s, -1).astype(jnp.float32),
            pool,
        )
