"""RPN proposal selection with static shapes.

Reference: maskrcnn_benchmark/modeling/rpn/inference.py:76-118 —
sigmoid objectness → per-image top-k (pre_nms_top_n) → decode with
weights (1,1,1,1) → clip → remove_small → NMS(0.7) capped at
post_nms_top_n → (train) append gt boxes with objectness 1
(inference.py:53-74).

All outputs are fixed-size padded arrays; our NMS returns boxes in
descending objectness order, so downstream "sort by objectness" steps
(teacher soften-proposal selection) become no-ops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..structures import boxes as B
from ..ops.nms import nms_padded


# TPU.FAST_PROPOSALS caps (the round-2 defaults, now opt-in): measured
# +13% train throughput over exact reference statistics (BASELINE.md),
# unmeasurable mAP effect — hence parity is the default.
FAST_PRE_NMS_CAP = 2048
FAST_POST_NMS_CAP = 512
FAST_APPROX_RECALL = 0.98


def _cap(cfg, kind: str, mode: str, ref_value: int) -> int:
    """Resolve a TPU.{kind}_NMS_TOP_N_{mode} cap; -1 = auto (no cap, or the
    fast cap when TPU.FAST_PROPOSALS is on)."""
    cap = int(cfg.TPU[f"{kind}_NMS_TOP_N_{mode}"])
    if cap < 0:
        if bool(cfg.TPU.get("FAST_PROPOSALS", False)):
            return FAST_PRE_NMS_CAP if kind == "PRE" else FAST_POST_NMS_CAP
        return ref_value
    return cap


def effective_approx_recall(cfg) -> float:
    """Pre-NMS approx_max_k recall target; -1 = auto (exact top-k, or 0.98
    under TPU.FAST_PROPOSALS).  0 disables the approximate path."""
    r = float(cfg.TPU.get("APPROX_PRE_NMS_RECALL", -1.0))
    if r < 0:
        return FAST_APPROX_RECALL if bool(cfg.TPU.get("FAST_PROPOSALS", False)) else 0.0
    return r


def effective_top_n(cfg, train: bool):
    """Effective (pre_nms, post_nms) proposal counts.

    The recipe values live in MODEL.RPN.{PRE,POST}_NMS_TOP_N_* (reference
    rpn/inference.py:150-163) and are honored exactly by default.
    TPU.{PRE,POST}_NMS_TOP_N_* act as static-shape compile caps when set
    (or implicitly under TPU.FAST_PROPOSALS).  The smaller wins, and a
    capped recipe is logged loudly — it changes proposal statistics vs the
    published configuration (the measured throughput/mAP-proxy tradeoff is
    recorded in BASELINE.md).
    """
    import logging

    mode = "TRAIN" if train else "TEST"
    pre_ref = int(cfg.MODEL.RPN[f"PRE_NMS_TOP_N_{mode}"])
    post_ref = int(cfg.MODEL.RPN[f"POST_NMS_TOP_N_{mode}"])
    pre = min(pre_ref, _cap(cfg, "PRE", mode, pre_ref))
    post = min(post_ref, _cap(cfg, "POST", mode, post_ref))
    if (pre, post) != (pre_ref, post_ref):
        logging.getLogger("abr_iod_tpu").warning(
            f"RPN {mode} top-N capped for static shapes: pre {pre_ref}->{pre}, "
            f"post {post_ref}->{post} (disable TPU.FAST_PROPOSALS / raise "
            f"cfg.TPU.*_NMS_TOP_N_{mode} for exact reference proposal "
            "statistics)"
        )
    return pre, post


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # [B, P, 4]
    scores: jnp.ndarray  # [B, P] objectness (sigmoid)
    valid: jnp.ndarray  # [B, P] bool


def _prepare_single(
    obj_logits,
    deltas,
    anchors,
    size_hw,
    pre_nms_top_n: int,
    min_size: float,
    approx_recall: float = 0.0,
):
    """Pre-NMS half of proposal selection for one image: sigmoid → top-k →
    decode → clip → small-box mask.  Returns (boxes [k,4], scores [k],
    valid [k]) in descending score order."""
    scores = jax.nn.sigmoid(obj_logits.astype(jnp.float32))
    k = min(pre_nms_top_n, scores.shape[0])
    if 0.0 < approx_recall < 1.0 and k < scores.shape[0]:
        # TPU-native approximate top-k (avoids the full O(N log N) sort
        # over every anchor — measured ~4% of the train step).  Only the
        # pre-NMS candidate pool is approximate; NMS and the post-NMS
        # ranking stay exact.  Set TPU.APPROX_PRE_NMS_RECALL=0 for the
        # reference's exact pool (parity harness does).
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k, recall_target=approx_recall
        )
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k)
    top_deltas = deltas[top_idx]
    top_anchors = anchors[top_idx]

    boxes = B.decode_boxes(
        top_deltas.astype(jnp.float32), top_anchors, weights=(1.0, 1.0, 1.0, 1.0)
    )
    boxes = B.clip_boxes_dynamic(boxes, size_hw)
    valid = B.small_box_mask(boxes, min_size) if min_size > 0 else jnp.ones((k,), bool)
    return boxes, top_scores, valid


def _select_single(
    obj_logits,
    deltas,
    anchors,
    size_hw,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    approx_recall: float = 0.0,
):
    boxes, top_scores, valid = _prepare_single(
        obj_logits, deltas, anchors, size_hw,
        pre_nms_top_n=pre_nms_top_n, min_size=min_size,
        approx_recall=approx_recall,
    )
    keep_idx, keep_valid = nms_padded(
        boxes, top_scores, valid, iou_threshold=nms_thresh,
        max_output=post_nms_top_n,
        presorted=True,  # top_k/approx_max_k emit descending scores
    )
    return boxes[keep_idx], top_scores[keep_idx], keep_valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "pre_nms_top_n", "post_nms_top_n", "nms_thresh", "min_size",
        "approx_recall",
    ),
)
def select_proposals(
    objectness,
    box_regression,
    anchors,
    sizes_hw,
    pre_nms_top_n: int = 12000,
    post_nms_top_n: int = 2000,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    approx_recall: float = 0.0,
) -> Proposals:
    """objectness [B, HWA], box_regression [B, HWA, 4], anchors [HWA, 4],
    sizes_hw [B, 2]."""
    fn = functools.partial(
        _select_single,
        pre_nms_top_n=pre_nms_top_n,
        post_nms_top_n=post_nms_top_n,
        nms_thresh=nms_thresh,
        min_size=min_size,
        approx_recall=approx_recall,
    )
    boxes, scores, valid = jax.vmap(fn, in_axes=(0, 0, None, 0))(
        objectness, box_regression, anchors, sizes_hw
    )
    return Proposals(boxes, scores, valid)


def select_proposals_multilevel(
    objectness,
    box_regression,
    anchors,
    sizes_hw,
    pre_nms_top_n: int = 12000,
    post_nms_top_n: int = 2000,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    approx_recall: float = 0.0,
) -> Proposals:
    """Per-level proposal selection with the level NMS sweeps FOLDED into
    one batched sweep.

    Semantics match calling ``select_proposals`` once per level and
    concatenating (the reference's FPN branch, rpn/inference.py:120-147:
    per-level top-k + NMS with the PRE/POST budgets applied per level):
    keep sets, ordering, validity and scores are bit-identical; decoded
    coordinates agree to f32 rounding (fusion-dependent FMA) — proven by
    tests/test_fpn_fold.py.

    Why fold: the NMS survivor-buffer sweep is a serial ~N/128-tile
    fori_loop (ops/nms.py).  Run per level, the FPN levels serialize
    their sweeps back-to-back; vmapping one sweep over a [B*L] folded
    batch axis runs them concurrently.  Only levels whose top-k pools
    are the SAME size fold together (at training statistics the three
    large levels all clamp to pre_nms_top_n) — padding shorter levels
    up to the widest pool was measured as a net loss on the real chip
    (the sweep is throughput-bound: +50% padded row-work outweighed the
    3.3x serial-step reduction, 43.0→38.7 img/s), so small levels run
    at their natural sizes.

    objectness: list of [B, HWA_l]; box_regression: list of
    [B, HWA_l, 4]; anchors: list of [HWA_l, 4]; sizes_hw: [B, 2].
    Returns concatenated-level Proposals [B, L*post_nms_top_n].
    """
    prepped = []
    for obj_f, reg_f, anc in zip(objectness, box_regression, anchors):
        fn = functools.partial(
            _prepare_single,
            pre_nms_top_n=min(pre_nms_top_n, obj_f.shape[1]),
            min_size=min_size,
            approx_recall=approx_recall,
        )
        prepped.append(
            jax.vmap(fn, in_axes=(0, 0, None, 0))(obj_f, reg_f, anc, sizes_hw)
        )

    nms = functools.partial(
        nms_padded, iou_threshold=nms_thresh, max_output=post_nms_top_n,
        presorted=True, multi_level=True,
    )
    # group adjacent levels with equal pool sizes; one vmapped sweep per
    # group over the folded [B*group] axis, zero padding
    out = [None] * len(prepped)
    i = 0
    while i < len(prepped):
        k = prepped[i][0].shape[1]
        j = i
        while j + 1 < len(prepped) and prepped[j + 1][0].shape[1] == k:
            j += 1
        group = prepped[i:j + 1]
        bsz = group[0][0].shape[0]
        n_g = len(group)
        boxes_f = jnp.concatenate([b for b, _, _ in group], axis=0)
        scores_f = jnp.concatenate([s for _, s, _ in group], axis=0)
        valid_f = jnp.concatenate([v for _, _, v in group], axis=0)
        keep_idx, keep_valid = jax.vmap(nms)(boxes_f, scores_f, valid_f)
        ob = jnp.take_along_axis(boxes_f, keep_idx[..., None], axis=1)
        os_ = jnp.take_along_axis(scores_f, keep_idx, axis=1)
        for g in range(n_g):
            sl = slice(g * bsz, (g + 1) * bsz)
            out[i + g] = (ob[sl], os_[sl], keep_valid[sl])
        i = j + 1

    return Proposals(
        jnp.concatenate([b for b, _, _ in out], axis=1),
        jnp.concatenate([s for _, s, _ in out], axis=1),
        jnp.concatenate([v for _, _, v in out], axis=1),
    )


def append_gt_proposals(proposals: Proposals, gt_boxes, gt_mask) -> Proposals:
    """Concatenate gt boxes (objectness 1) onto the padded proposal set
    (reference: rpn/inference.py:53-74)."""
    boxes = jnp.concatenate([proposals.boxes, gt_boxes], axis=1)
    scores = jnp.concatenate(
        [proposals.scores, jnp.ones(gt_mask.shape, proposals.scores.dtype)], axis=1
    )
    valid = jnp.concatenate([proposals.valid, gt_mask], axis=1)
    return Proposals(boxes, scores, valid)
