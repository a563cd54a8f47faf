"""VOC instance-segmentation evaluation (mask + box AP).

Reference: data/datasets/evaluation/voc/voc_eval_inst.py — chainercv-
style instance-seg AP for the VOC-2012/SBD Mask-on variant: per-class
greedy matching in score order by MASK IoU at threshold .5 (and box AP
alongside), area-under-PR.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

from .voc_eval import calc_detection_voc_ap


def mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a [N,H,W] bool, b [M,H,W] bool → [N,M]."""
    a2 = a.reshape(a.shape[0], -1).astype(np.float64)
    b2 = b.reshape(b.shape[0], -1).astype(np.float64)
    inter = a2 @ b2.T
    union = a2.sum(1)[:, None] + b2.sum(1)[None, :] - inter
    return inter / np.where(union > 0, union, 1.0)


def eval_instance_seg_voc(predictions: List[Dict], ground_truths: List[Dict],
                          iou_thresh: float = 0.5) -> Dict:
    """predictions[i]: {'masks' [N,H,W] bool, 'labels', 'scores'};
    ground_truths[i]: {'masks' [M,H,W] bool, 'labels'}."""
    n_pos = defaultdict(int)
    score = defaultdict(list)
    match = defaultdict(list)

    for pred, gt in zip(predictions, ground_truths):
        labels_present = np.unique(
            np.concatenate([pred["labels"], gt["labels"]]).astype(int)
        )
        for l in labels_present:
            pm = pred["labels"] == l
            p_masks = pred["masks"][pm]
            ps = pred["scores"][pm]
            order = ps.argsort()[::-1]
            p_masks, ps = p_masks[order], ps[order]

            gm = gt["labels"] == l
            g_masks = gt["masks"][gm]
            n_pos[l] += int(gm.sum())
            score[l].extend(ps)

            if len(p_masks) == 0:
                continue
            if len(g_masks) == 0:
                match[l].extend([0] * len(p_masks))
                continue
            iou = mask_iou(p_masks, g_masks)
            gt_index = iou.argmax(axis=1)
            gt_index[iou.max(axis=1) < iou_thresh] = -1
            selected = np.zeros(len(g_masks), bool)
            for gi in gt_index:
                if gi >= 0 and not selected[gi]:
                    match[l].append(1)
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
    ap = calc_detection_voc_ap(prec, rec)
    return {"ap": ap, "map": float(np.nanmean(ap)) if len(ap) else float("nan")}
