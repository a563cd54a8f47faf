"""VOC instance-segmentation evaluation (mask + box AP).

Reference: data/datasets/evaluation/voc/voc_eval_inst.py — chainercv-
style instance-seg AP for the VOC-2012/SBD Mask-on variant, restated
exactly:

  * AP is averaged over ``np.arange(0.5, 0.95, 0.05)`` — NINE IoU
    thresholds 0.50..0.90 (the reference's arange excludes 0.95,
    voc_eval_inst.py:26) — for BOTH the mask AP ("mAP IS") and the box
    AP ("mAP OD") computed from the same score-sorted predictions.
  * mask IoU is pixel TP/(TP+FP+FN); box IoU reproduces the voc_eval
    double-+1 quirk (maxima pre-incremented through the TO_REMOVE=1
    boxlist_iou, voc_eval_inst.py:150-158).
  * per-class greedy matching in score order; every gt counts
    (no difficult handling, voc_eval_inst.py:140); area-under-PR AP.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

from .voc_eval import _iou as _box_iou_quirk, calc_detection_voc_ap

IOU_THRESHOLDS = np.arange(0.5, 0.95, 0.05)  # 9 values, .95 excluded


def _nanmean(a, axis=None):
    """np.nanmean that stays silent on all-NaN slices (classes with no GT
    instances legitimately have NaN AP at every threshold; np.nanmean would
    emit `RuntimeWarning: Mean of empty slice` for them)."""
    a = np.asarray(a, dtype=np.float64)
    mask = ~np.isnan(a)
    cnt = mask.sum(axis=axis)
    tot = np.where(mask, a, 0.0).sum(axis=axis)
    return np.where(cnt > 0, tot / np.maximum(cnt, 1), np.nan)


def mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a [N,H,W] bool, b [M,H,W] bool → [N,M] pixel IoU."""
    a2 = a.reshape(a.shape[0], -1).astype(np.float64)
    b2 = b.reshape(b.shape[0], -1).astype(np.float64)
    inter = a2 @ b2.T
    union = a2.sum(1)[:, None] + b2.sum(1)[None, :] - inter
    return inter / np.where(union > 0, union, 1.0)


def _greedy_match(iou: np.ndarray, thresh: float, n_gt: int):
    """Reference per-class loop (voc_eval_inst.py:160-190): each pred (in
    score order) takes its argmax gt if IoU >= thresh; first claim wins."""
    gt_index = iou.argmax(axis=1)
    gt_index[iou.max(axis=1) < thresh] = -1
    match, selected = [], np.zeros(n_gt, bool)
    for gi in gt_index:
        if gi >= 0 and not selected[gi]:
            match.append(1)
            selected[gi] = True
        else:
            match.append(0)
    return match


def _ap_at(per_class_entries, n_pos, thresh: float, which: str):
    score = defaultdict(list)
    match = defaultdict(list)
    for l, entries in per_class_entries.items():
        for ps, iou_m, iou_b, g in entries:
            score[l].extend(ps)
            if len(ps) == 0:
                continue
            if g == 0:
                match[l].extend([0] * len(ps))
                continue
            iou = iou_m if which == "mask" else iou_b
            match[l].extend(_greedy_match(iou, thresh, g))
    n_fg_class = max(n_pos.keys()) + 1 if n_pos else 0
    prec = [None] * n_fg_class
    rec = [None] * n_fg_class
    for l in n_pos.keys():
        score_l = np.asarray(score[l])
        match_l = np.asarray(match[l], dtype=np.int8)
        order = score_l.argsort()[::-1]
        match_l = match_l[order]
        tp = np.cumsum(match_l == 1)
        fp = np.cumsum(match_l == 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            prec[l] = tp / (fp + tp)
        if n_pos[l] > 0:
            rec[l] = tp / n_pos[l]
    return calc_detection_voc_ap(prec, rec)


def eval_instance_seg_voc(predictions: List[Dict], ground_truths: List[Dict],
                          iou_thresholds=None) -> Dict:
    """predictions[i]: {'masks' [N,H,W] bool, 'labels', 'scores',
    optional 'boxes'}; ground_truths[i]: {'masks' [M,H,W] bool, 'labels',
    optional 'boxes'}.  Returns the reference protocol: per-class mask AP
    averaged over the nine 0.50..0.90 thresholds ('ap'/'map' — mAP IS)
    and, when boxes are present on both sides, the box AP alongside
    ('ap_box'/'map_box' — mAP OD), plus the single-threshold 'map50'."""
    thresholds = (IOU_THRESHOLDS if iou_thresholds is None
                  else np.asarray(iou_thresholds, np.float64))
    have_boxes = all("boxes" in p for p in predictions) and all(
        "boxes" in g for g in ground_truths) and len(predictions) > 0

    n_pos = defaultdict(int)
    per_class = defaultdict(list)
    for pred, gt in zip(predictions, ground_truths):
        labels_present = np.unique(
            np.concatenate([pred["labels"], gt["labels"]]).astype(int)
        )
        for l in labels_present:
            pm = pred["labels"] == l
            ps = pred["scores"][pm]
            order = ps.argsort()[::-1]
            ps = ps[order]
            p_masks = pred["masks"][pm][order]
            gm = gt["labels"] == l
            g_masks = gt["masks"][gm]
            g = int(gm.sum())
            n_pos[l] += g

            iou_m = (mask_iou(p_masks, g_masks)
                     if len(ps) and g else np.zeros((len(ps), g)))
            iou_b = None
            if have_boxes:
                pb = pred["boxes"][pm][order].copy()
                gb = gt["boxes"][gm].copy()
                if len(ps) and g:
                    # "integer typed boxes": maxima += 1 into the +1 IoU
                    pb[:, 2:] += 1
                    gb[:, 2:] += 1
                    iou_b = _box_iou_quirk(pb, gb)
                else:
                    iou_b = np.zeros((len(ps), g))
            per_class[l].append((ps, iou_m, iou_b, g))

    ap_stack = np.stack([_ap_at(per_class, n_pos, t, "mask")
                         for t in thresholds])
    out = {
        "ap": _nanmean(ap_stack, axis=0),
        "map": float(_nanmean(ap_stack)) if ap_stack.size else float("nan"),
    }
    # only report a '@.5' number when 0.5 is actually the first threshold
    if ap_stack.size and abs(float(thresholds[0]) - 0.5) < 1e-9:
        out["map50"] = float(_nanmean(ap_stack[0]))
    if have_boxes:
        box_stack = np.stack([_ap_at(per_class, n_pos, t, "box")
                              for t in thresholds])
        out["ap_box"] = _nanmean(box_stack, axis=0)
        out["map_box"] = (float(_nanmean(box_stack))
                          if box_stack.size else float("nan"))
    return out
