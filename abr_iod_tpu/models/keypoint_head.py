"""Keypoint R-CNN head (reference: modeling/roi_heads/keypoint_head/ —
registered in the reference, unused by shipped configs; kept for model-
family completeness).

  * KeypointRCNNFeatureExtractor (roi_keypoint_feature_extractors.py):
    stack of 3x3/512 convs over pooled RoI features
  * KRCNNConvDeconvUpsampleHead (roi_keypoint_predictors.py): deconv(4,2)
    + 2x bilinear upsample → per-keypoint heatmaps
  * loss (loss.py:54-172): softmax cross-entropy over the flattened
    heatmap at each visible keypoint's discretized location
  * heatmaps_to_keypoints_np (inference.py:40-95): the EXACT host-side
    decode — cv2 INTER_CUBIC upsample to the box size, sub-bin argmax,
    raw-logit score (used by the driver's eval path);
    heatmaps_to_keypoints is the in-jit static-shape approximation
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class KeypointRCNNFeatureExtractor(nn.Module):
    layers: tuple = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled.astype(self.dtype)
        for i, ch in enumerate(self.layers):
            x = nn.relu(
                nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name=f"conv_fcn{i + 1}")(x)
            )
        return x


class KeypointRCNNPredictor(nn.Module):
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal(),
            name="kps_score_lowres",
        )(x.astype(self.dtype))
        n, h, w, k = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, k), method="bilinear")
        return x.astype(jnp.float32)


def keypoints_to_heatmap_targets(keypoints, rois, heatmap_size: int):
    """keypoints [N, K, 3] (x, y, vis), rois [N, 4] →
    (target index [N, K] into the flattened heatmap, valid [N, K])
    (reference keypoint_head/loss.py keypoints_to_heat_map)."""
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    sx = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1.0)
    sy = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1.0)
    x = ((keypoints[..., 0] - x1) * sx).astype(jnp.int32)
    y = ((keypoints[..., 1] - y1) * sy).astype(jnp.int32)
    inside = (x >= 0) & (x < heatmap_size) & (y >= 0) & (y < heatmap_size)
    valid = inside & (keypoints[..., 2] > 0)
    idx = jnp.clip(y, 0, heatmap_size - 1) * heatmap_size + jnp.clip(
        x, 0, heatmap_size - 1
    )
    return idx, valid


def keypoint_rcnn_loss(kp_logits, rois, keypoints, roi_is_pos):
    """kp_logits [N, H, H, K]; keypoints [N, K, 3]; roi_is_pos [N]."""
    n, h, _, k = kp_logits.shape
    idx, valid = keypoints_to_heatmap_targets(keypoints, rois, h)
    valid = valid & roi_is_pos[:, None]
    flat = kp_logits.reshape(n, h * h, k).transpose(0, 2, 1)  # [N, K, HH]
    logp = jax.nn.log_softmax(flat.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, idx[..., None], axis=2)[..., 0]
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def heatmaps_to_keypoints_np(maps: "np.ndarray", rois: "np.ndarray"):
    """EXACT host-side keypoint decode (reference keypoint_head/
    inference.py:40-95, Detectron semantics): each RoI's [Hm, Hm, K]
    heatmap is cv2-resized (INTER_CUBIC) to the box's integer
    ceil(width) x ceil(height), the argmax is taken on the UPSAMPLED map
    (sub-bin localization), positions map back through the Heckbert +0.5
    convention, and the score is the RAW logit at the argmax.

    maps [N, Hm, Hm, K] float32, rois [N, 4] (same coordinate frame the
    keypoints should come out in — the driver passes original-image
    boxes) → [N, K, 3] (x, y, logit)."""
    import cv2
    import numpy as np

    n = maps.shape[0]
    k = maps.shape[-1]
    out = np.zeros((n, k, 3), np.float32)
    if n == 0:
        return out
    widths = np.maximum(rois[:, 2] - rois[:, 0], 1.0)
    heights = np.maximum(rois[:, 3] - rois[:, 1], 1.0)
    widths_ceil = np.ceil(widths)
    heights_ceil = np.ceil(heights)
    for i in range(n):
        rw, rh = int(widths_ceil[i]), int(heights_ceil[i])
        width_correction = widths[i] / rw
        height_correction = heights[i] / rh
        roi_map = cv2.resize(
            np.ascontiguousarray(maps[i], np.float32), (rw, rh),
            interpolation=cv2.INTER_CUBIC,
        )
        if roi_map.ndim == 2:  # cv2 squeezes K == 1
            roi_map = roi_map[:, :, None]
        roi_map = roi_map.transpose(2, 0, 1)  # [K, rh, rw]
        w = roi_map.shape[2]
        pos = roi_map.reshape(k, -1).argmax(axis=1)
        x_int = pos % w
        y_int = (pos - x_int) // w
        out[i, :, 0] = (x_int + 0.5) * width_correction + rois[i, 0]
        out[i, :, 1] = (y_int + 0.5) * height_correction + rois[i, 1]
        out[i, :, 2] = roi_map[np.arange(k), y_int, x_int]
    return out


def heatmaps_to_keypoints(kp_logits, rois):
    """[N, H, H, K], [N, 4] → keypoints [N, K, 3] (x, y, score) in image
    coordinates — the in-jit STATIC-SHAPE variant: bin-center argmax on
    the raw heatmap with a softmax score.  The eval pipeline instead
    returns raw heatmaps and decodes host-side with
    heatmaps_to_keypoints_np (the reference's exact cv2 upsample +
    sub-bin argmax, keypoint_head/inference.py:40-95)."""
    n, h, _, k = kp_logits.shape
    flat = kp_logits.reshape(n, h * h, k)
    idx = jnp.argmax(flat, axis=1)  # [N, K]
    score = jax.nn.softmax(flat, axis=1)
    best = jnp.take_along_axis(score, idx[:, None, :], axis=1)[:, 0, :]
    yy = (idx // h).astype(jnp.float32) + 0.5
    xx = (idx % h).astype(jnp.float32) + 0.5
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    sx = jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1.0) / h
    sy = jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1.0) / h
    return jnp.stack([x1 + xx * sx, y1 + yy * sy, best], axis=-1)
