"""Pure-functional box math on fixed-shape padded arrays.

This module is the TPU-native replacement for the reference's dynamic
``BoxList`` world (reference: maskrcnn_benchmark/structures/bounding_box.py,
boxlist_ops.py, modeling/box_coder.py).  Instead of variable-length tensors
we carry ``boxes[..., N, 4]`` (xyxy, float32) together with a boolean
validity ``mask[..., N]``; every function is shape-preserving and
jit/vmap-friendly.

Pixel conventions follow the reference exactly so that numerical parity
tests hold:
  * areas / IoU use the +1 pixel convention
    (reference: structures/boxlist_ops.py:80-88)
  * box encode/decode uses widths = x2 - x1 + 1 and decodes x2 with a -1
    (reference: modeling/box_coder.py:31-55, 64-95)
  * horizontal flip maps x -> W - x - 1
    (reference: structures/bounding_box.py transpose())
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

TO_REMOVE = 1.0  # the reference's +1 pixel convention
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


class PaddedBoxes(NamedTuple):
    """A fixed-size batch of boxes with a validity mask.

    boxes:  [..., N, 4] xyxy
    mask:   [..., N] bool — True where the slot holds a real box
    """

    boxes: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_valid(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the +1 convention (reference: bounding_box.py area())."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU [N, M] with +1 convention (reference: boxlist_ops.py:53-97)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.where(union > 0, union, 1.0)


def masked_iou(
    boxes1: jnp.ndarray,
    mask1: jnp.ndarray,
    boxes2: jnp.ndarray,
    mask2: jnp.ndarray,
) -> jnp.ndarray:
    """IoU that is exactly 0 wherever either side is padding."""
    iou = box_iou(boxes1, boxes2)
    valid = mask1[..., :, None] & mask2[..., None, :]
    return jnp.where(valid, iou, 0.0)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> jnp.ndarray:
    """Encode gt boxes w.r.t. proposals (reference: box_coder.py:22-55)."""
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    wx, wy, ww, wh = weights
    # guard against degenerate padded proposals: clamp sizes to >= 1
    ex_w = jnp.maximum(ex_w, 1.0)
    ex_h = jnp.maximum(ex_h, 1.0)
    gt_w = jnp.maximum(gt_w, 1.0)
    gt_h = jnp.maximum(gt_h, 1.0)

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    rel_codes: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
    bbox_xform_clip: float = BBOX_XFORM_CLIP,
) -> jnp.ndarray:
    """Decode deltas on top of anchor/proposal boxes.

    rel_codes: [..., N, 4*K] (K classes interleaved as in the reference)
    boxes:     [..., N, 4]
    returns    [..., N, 4*K]
    (reference: box_coder.py:57-105 — note the -1 on x2/y2.)
    """
    widths = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    heights = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = rel_codes[..., 0::4] / wx
    dy = rel_codes[..., 1::4] / wy
    dw = rel_codes[..., 2::4] / ww
    dh = rel_codes[..., 3::4] / wh

    dw = jnp.clip(dw, None, bbox_xform_clip)
    dh = jnp.clip(dh, None, bbox_xform_clip)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w - 1.0
    y2 = pred_cy + 0.5 * pred_h - 1.0
    # re-interleave to [..., N, 4K]
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., N, K, 4]
    shape = rel_codes.shape
    return out.reshape(shape)


def clip_boxes_to_image(boxes: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Clamp to [0, size-1] (reference: bounding_box.py clip_to_image())."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0::4], 0.0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1::4], 0.0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2::4], 0.0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3::4], 0.0, h - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(boxes.shape)


def clip_boxes_dynamic(boxes: jnp.ndarray, hw: jnp.ndarray) -> jnp.ndarray:
    """Clip with a per-image (possibly traced) [h, w] size array."""
    h = hw[..., 0:1].astype(boxes.dtype)
    w = hw[..., 1:2].astype(boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def hflip_boxes(boxes: jnp.ndarray, image_width: float) -> jnp.ndarray:
    """Horizontal flip (reference: bounding_box.py transpose(), method 0)."""
    x1 = image_width - boxes[..., 2] - TO_REMOVE
    x2 = image_width - boxes[..., 0] - TO_REMOVE
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True where both sides >= min_size, in xywh terms
    (reference: boxlist_ops.py remove_small_boxes; xywh w = x2-x1+1)."""
    ws = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    hs = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (ws >= min_size) & (hs >= min_size)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1 + TO_REMOVE, y2 - y1 + TO_REMOVE], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w - TO_REMOVE, y + h - TO_REMOVE], axis=-1)


def resize_boxes(boxes: jnp.ndarray, ratio_w, ratio_h) -> jnp.ndarray:
    """Scale coordinates (reference: bounding_box.py resize())."""
    x1 = boxes[..., 0] * ratio_w
    x2 = boxes[..., 2] * ratio_w
    y1 = boxes[..., 1] * ratio_h
    y2 = boxes[..., 3] * ratio_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def pad_boxes(boxes, labels, n_max: int, extra=None):
    """Host-side helper: pad [n,4]/[n] numpy arrays to fixed n_max with mask."""
    import numpy as np

    n = boxes.shape[0]
    if n > n_max:
        boxes, labels = boxes[:n_max], labels[:n_max]
        if extra is not None:
            extra = extra[:n_max]
        n = n_max
    out_boxes = np.zeros((n_max, 4), dtype=np.float32)
    out_labels = np.zeros((n_max,), dtype=np.int32)
    out_mask = np.zeros((n_max,), dtype=bool)
    out_boxes[:n] = boxes
    out_labels[:n] = labels
    out_mask[:n] = True
    if extra is not None:
        out_extra = np.zeros((n_max,) + extra.shape[1:], dtype=extra.dtype)
        out_extra[:n] = extra
        return out_boxes, out_labels, out_mask, out_extra
    return out_boxes, out_labels, out_mask
