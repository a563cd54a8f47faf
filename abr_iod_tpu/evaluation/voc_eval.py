"""VOC detection mAP (chainercv-style).

Reference: data/datasets/evaluation/voc/voc_eval.py:60-228.  Same
algorithm on plain numpy dicts instead of BoxLists: per-class greedy
matching in score order with difficult-GT handling (+1 on box maxima
before IoU, "integer typed boxes"), precision/recall accumulation across
the dataset, and area-under-PR AP (optionally the 07 11-point metric).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """boxlist_iou restated (boxlist_ops.py:53-97, TO_REMOVE=1) — the
    reference's voc_eval feeds it boxes whose maxima were ALREADY
    incremented (`[:, 2:] += 1`, voc_eval.py:121-124), so widths become
    (x2 - x1 + 2): a double-+1 quirk of the reference adaptation that
    this restatement reproduces exactly (chainercv's original uses a
    single +1; near-threshold matches can differ)."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl + 1.0, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(a[:, 2:] - a[:, :2] + 1.0, axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2] + 1.0, axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.where(union > 0, union, 1.0)


def calc_detection_voc_prec_rec(predictions: List[Dict], ground_truths: List[Dict],
                                iou_thresh: float = 0.5):
    """predictions[i]: {'boxes' [N,4], 'labels' [N], 'scores' [N]};
    ground_truths[i]: {'boxes', 'labels', 'difficult'}."""
    n_pos = defaultdict(int)
    score = defaultdict(list)
    match = defaultdict(list)

    for pred, gt in zip(predictions, ground_truths):
        labels_present = np.unique(
            np.concatenate([pred["labels"], gt["labels"]]).astype(int)
        )
        for l in labels_present:
            pm = pred["labels"] == l
            pb = pred["boxes"][pm]
            ps = pred["scores"][pm]
            order = ps.argsort()[::-1]
            pb, ps = pb[order], ps[order]

            gm = gt["labels"] == l
            gb = gt["boxes"][gm]
            gd = gt["difficult"][gm]

            n_pos[l] += int(np.logical_not(gd).sum())
            score[l].extend(ps)

            if len(pb) == 0:
                continue
            if len(gb) == 0:
                match[l].extend([0] * len(pb))
                continue

            pb = pb.copy()
            pb[:, 2:] += 1
            gb = gb.copy()
            gb[:, 2:] += 1
            iou = _iou(pb, gb)
            gt_index = iou.argmax(axis=1)
            gt_index[iou.max(axis=1) < iou_thresh] = -1

            selected = np.zeros(len(gb), dtype=bool)
            for gi in gt_index:
                if gi >= 0:
                    if gd[gi]:
                        match[l].append(-1)
                    elif not selected[gi]:
                        match[l].append(1)
                    else:
                        match[l].append(0)
                    selected[gi] = True
                else:
                    match[l].append(0)

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
    return prec, rec


def calc_detection_voc_ap(prec, rec, use_07_metric: bool = False) -> np.ndarray:
    n_fg_class = len(prec)
    ap = np.empty(n_fg_class)
    for l in range(n_fg_class):
        if prec[l] is None or rec[l] is None:
            ap[l] = np.nan
            continue
        if use_07_metric:
            ap[l] = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                if np.sum(rec[l] >= t) == 0:
                    p = 0.0
                else:
                    p = np.max(np.nan_to_num(prec[l])[rec[l] >= t])
                ap[l] += p / 11
        else:
            mpre = np.concatenate(([0], np.nan_to_num(prec[l]), [0]))
            mrec = np.concatenate(([0], rec[l], [1]))
            mpre = np.maximum.accumulate(mpre[::-1])[::-1]
            i = np.where(mrec[1:] != mrec[:-1])[0]
            ap[l] = np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])
    return ap


def eval_detection_voc(predictions, ground_truths, iou_thresh: float = 0.5,
                       use_07_metric: bool = False) -> Dict:
    prec, rec = calc_detection_voc_prec_rec(predictions, ground_truths, iou_thresh)
    ap = calc_detection_voc_ap(prec, rec, use_07_metric)
    return {"ap": ap, "map": float(np.nanmean(ap)) if len(ap) else float("nan")}
