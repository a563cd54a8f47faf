"""Detection post-processing (eval path).

Reference: modeling/roi_heads/box_head/inference.py:105-151 — softmax
over class logits, per-class box decoding (weights 10,10,5,5), clip,
per-class score threshold (.05) + NMS(.5), concatenate classes, keep the
top ``detections_per_img`` (100) by score over all classes.

Static shapes: each foreground class contributes up to ``per_class_topk``
padded detections; the final cross-class cap is a fixed top-k (the
reference uses a kthvalue threshold which can keep >100 on ties — an
edge case we trade for a static shape).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..structures import boxes as B
from ..ops.nms import nms_padded


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [B, D, 4]
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32 (1-based classes)
    valid: jnp.ndarray  # [B, D] bool


def _postprocess_single(
    cls_logits,
    box_reg,
    prop_boxes,
    prop_valid,
    size_hw,
    score_thresh: float,
    nms_thresh: float,
    detections_per_img: int,
    per_class_topk: int,
    bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
    include_background: bool = False,
):
    s, c = cls_logits.shape
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    decoded = B.decode_boxes(box_reg.astype(jnp.float32), prop_boxes, bbox_reg_weights)
    decoded = decoded.reshape(s, c, 4)
    decoded = B.clip_boxes_dynamic(decoded, size_hw[None, :])  # [1,2] broadcasts over [s,c]

    def per_class(j):
        scores_j = probs[:, j]
        valid_j = prop_valid & (scores_j > score_thresh)
        idx, ok = nms_padded(
            decoded[:, j], scores_j, valid_j, nms_thresh, per_class_topk
        )
        return decoded[idx, j], scores_j[idx], ok

    if include_background:
        # the reference's filter_results also builds a background boxlist
        # (box_head/inference.py:131-137, returned as results_background)
        bg_boxes, bg_scores, bg_ok = per_class(jnp.int32(0))
    class_ids = jnp.arange(1, c)  # skip background
    boxes_k, scores_k, ok_k = jax.vmap(per_class)(class_ids)
    labels_k = jnp.broadcast_to(class_ids[:, None], ok_k.shape)

    flat_boxes = boxes_k.reshape(-1, 4)
    flat_scores = jnp.where(ok_k, scores_k, -1.0).reshape(-1)
    flat_labels = labels_k.reshape(-1)
    flat_ok = ok_k.reshape(-1)

    d = min(detections_per_img, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, d)
    out = (
        flat_boxes[top_idx],
        top_scores,
        flat_labels[top_idx].astype(jnp.int32),
        flat_ok[top_idx] & (top_scores > 0),
    )
    if include_background:
        return out + ((bg_boxes, bg_scores, bg_ok),)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_thresh",
        "nms_thresh",
        "detections_per_img",
        "per_class_topk",
        "bbox_reg_weights",
    ),
)
def postprocess_detections(
    cls_logits,
    box_reg,
    prop_boxes,
    prop_valid,
    sizes_hw,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
    per_class_topk: int = 100,
    bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
) -> Detections:
    fn = functools.partial(
        _postprocess_single,
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
        per_class_topk=per_class_topk,
        bbox_reg_weights=tuple(bbox_reg_weights),
    )
    boxes, scores, labels, valid = jax.vmap(fn)(
        cls_logits, box_reg, prop_boxes, prop_valid, sizes_hw
    )
    return Detections(boxes, scores, labels, valid)


def postprocess_with_background(
    cls_logits, box_reg, prop_boxes, prop_valid, sizes_hw, **kwargs
):
    """Variant that also returns the background-class detections (the
    reference's (result, results_background) pair,
    box_head/inference.py:105-151)."""
    fn = functools.partial(
        _postprocess_single, include_background=True,
        score_thresh=float(kwargs.get("score_thresh", 0.05)),
        nms_thresh=float(kwargs.get("nms_thresh", 0.5)),
        detections_per_img=int(kwargs.get("detections_per_img", 100)),
        per_class_topk=int(kwargs.get("per_class_topk", 100)),
        bbox_reg_weights=tuple(kwargs.get("bbox_reg_weights", (10.0, 10.0, 5.0, 5.0))),
    )
    boxes, scores, labels, valid, bg = jax.vmap(fn)(
        cls_logits, box_reg, prop_boxes, prop_valid, sizes_hw
    )
    return Detections(boxes, scores, labels, valid), bg
