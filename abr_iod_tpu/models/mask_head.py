"""Mask R-CNN head (reference: modeling/roi_heads/mask_head/).

Components mirrored:
  * MaskRCNNFPNFeatureExtractor (roi_mask_feature_extractors.py:17-68):
    multi-level pool → stack of 3x3 convs
  * MaskRCNNC4Predictor (roi_mask_predictors.py:11-33): ConvTranspose 2x
    upsample + relu + 1x1 logits per class; MaskRCNNConv1x1Predictor
  * mask loss (loss.py:100-135): BCE between the per-positive-RoI
    predicted mask of its gt class and the gt mask projected onto the
    proposal box
  * soft-label API for distillation (mask_head.py:81-86)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structures.masks import crop_and_resize_masks


class MaskRCNNFPNFeatureExtractor(nn.Module):
    layers: tuple = (256, 256, 256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled.astype(self.dtype)
        for i, ch in enumerate(self.layers):
            x = nn.relu(
                nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name=f"mask_fcn{i + 1}")(x)
            )
        return x


class MaskRCNNC4Predictor(nn.Module):
    num_classes: int
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.dim_reduced, (2, 2), strides=(2, 2), dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(), name="conv5_mask",
        )(x.astype(self.dtype))
        x = nn.relu(x)
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(), name="mask_fcn_logits",
        )(x).astype(jnp.float32)


class MaskRCNNConv1x1Predictor(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(), name="mask_fcn_logits",
        )(x.astype(self.dtype)).astype(jnp.float32)


def mask_rcnn_loss(mask_logits, rois, roi_labels, roi_is_pos,
                   matched_gt_masks):
    """mask_logits [N, M, M, C] (per sampled RoI), rois [N, 4],
    roi_labels [N], roi_is_pos [N] bool, matched_gt_masks [N, H, W]
    (each RoI's matched gt instance mask in image coords).

    Reference loss.py:100-135: BCE over the gt-class channel of each
    positive RoI vs. the projected gt mask; zero when no positives.
    """
    n, m, _, c = mask_logits.shape
    targets = crop_and_resize_masks(matched_gt_masks, rois, m)  # [N, M, M]
    per_class = jnp.take_along_axis(
        mask_logits, roi_labels.clip(0)[:, None, None, None], axis=3
    )[..., 0]
    logits = per_class.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    pos = roi_is_pos.astype(jnp.float32)[:, None, None]
    denom = jnp.maximum(jnp.sum(pos) * m * m, 1.0)
    return jnp.sum(bce * pos) / denom


def mask_rcnn_loss_from_crops(mask_logits, rois, roi_labels, roi_is_pos,
                              gt_mask_crops, gt_boxes, matched_gt):
    """Batch-wide mask BCE from box-normalized GT crops (the loader-side
    mask representation — see structures.masks.resample_gt_crops_to_rois).

    mask_logits [B, S, M, M, C], rois [B, S, 4], roi_labels [B, S],
    roi_is_pos [B, S] bool, gt_mask_crops [B, G, R, R],
    gt_boxes [B, G, 4], matched_gt [B, S] int32.

    Matches the reference's normalization: one BCE mean over all positive
    RoIs of the whole batch (mask_head/loss.py:100-135).
    """
    from ..structures.masks import resample_gt_crops_to_rois

    b, s, m, _, c = mask_logits.shape
    targets = jax.vmap(
        lambda crops, boxes, mg, r: resample_gt_crops_to_rois(crops, boxes, mg, r, m)
    )(gt_mask_crops, gt_boxes, matched_gt, rois)  # [B, S, M, M]

    per_class = jnp.take_along_axis(
        mask_logits, roi_labels.clip(0)[:, :, None, None, None], axis=4
    )[..., 0]
    logits = per_class.astype(jnp.float32)
    targets = (targets > 0.5).astype(jnp.float32)  # binarize resampled crops
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    pos = roi_is_pos.astype(jnp.float32)[:, :, None, None]
    denom = jnp.maximum(jnp.sum(roi_is_pos.astype(jnp.float32)) * m * m, 1.0)
    return jnp.sum(bce * pos) / denom
