"""COCO-style detection evaluation, implemented natively.

Reference: data/datasets/evaluation/coco/coco_eval.py (a pycocotools
wrapper + the EXPECTED_RESULTS regression assertion, :436).  This
environment has no pycocotools, so the COCOeval bbox protocol is
implemented directly in numpy: 101-point interpolated AP averaged over
IoU thresholds .50:.05:.95, per-class then averaged (area ranges and
maxDets=100 follow the standard protocol's "all"/100 setting).

``check_expected_results`` mirrors the reference's sigma-tolerance
regression gate (coco_eval.py check_expected_results).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.where(union > 0, union, 1.0)


def _ap_for_class(preds, gts, iou_t: float, max_dets: int = 100):
    """Greedy COCO matching at one IoU threshold.  Returns (scores,
    tp flags, n_gt)."""
    scores, tps = [], []
    n_gt = 0
    for pred, gt in zip(preds, gts):
        n_gt += len(gt)
        if len(pred) == 0:
            continue
        order = np.argsort(-pred[:, 4], kind="stable")[:max_dets]
        p = pred[order]
        matched = np.zeros(len(gt), bool)
        iou = _iou_xyxy(p[:, :4], gt) if len(gt) else np.zeros((len(p), 0))
        for i in range(len(p)):
            best_j, best_iou = -1, iou_t
            for j in range(len(gt)):
                if matched[j]:
                    continue
                if iou[i, j] >= best_iou:
                    best_iou = iou[i, j]
                    best_j = j
            scores.append(p[i, 4])
            if best_j >= 0:
                matched[best_j] = True
                tps.append(1)
            else:
                tps.append(0)
    return np.asarray(scores), np.asarray(tps), n_gt


def _interp_ap(scores, tps, n_gt) -> float:
    if n_gt == 0:
        return np.nan
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tps = tps[order]
    tp_cum = np.cumsum(tps)
    fp_cum = np.cumsum(1 - tps)
    rec = tp_cum / n_gt
    prec = tp_cum / np.maximum(tp_cum + fp_cum, 1)
    # precision envelope + 101-point interpolation (COCOeval accumulate)
    for i in range(len(prec) - 1, 0, -1):
        prec[i - 1] = max(prec[i - 1], prec[i])
    idx = np.searchsorted(rec, RECALL_THRESHOLDS, side="left")
    q = np.where(idx < len(prec), prec[np.clip(idx, 0, len(prec) - 1)], 0.0)
    return float(q.mean())


def eval_detection_coco(predictions: List[Dict], ground_truths: List[Dict],
                        max_dets: int = 100) -> Dict:
    """predictions[i]: {'boxes','labels','scores'};
    ground_truths[i]: {'boxes','labels'}.  Returns AP, AP50, AP75 and
    per-class AP."""
    labels_all = set()
    for gt in ground_truths:
        labels_all.update(np.unique(gt["labels"]).tolist())
    labels_all = sorted(int(l) for l in labels_all if l > 0)

    per_class_ap = {}
    per_class_ap50 = {}
    per_class_ap75 = {}
    for l in labels_all:
        preds = []
        gts = []
        for pred, gt in zip(predictions, ground_truths):
            pm = pred["labels"] == l
            preds.append(
                np.concatenate(
                    [pred["boxes"][pm], pred["scores"][pm, None]], axis=1
                )
                if pm.any()
                else np.zeros((0, 5))
            )
            gm = gt["labels"] == l
            gts.append(gt["boxes"][gm])
        aps = []
        for t in IOU_THRESHOLDS:
            s, tp, n = _ap_for_class(preds, gts, float(t), max_dets)
            aps.append(_interp_ap(s, tp, n))
        aps = np.asarray(aps)
        per_class_ap[l] = float(np.nanmean(aps))
        per_class_ap50[l] = float(aps[0])
        per_class_ap75[l] = float(aps[5])

    def avg(d):
        vals = [v for v in d.values() if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    return {
        "AP": avg(per_class_ap),
        "AP50": avg(per_class_ap50),
        "AP75": avg(per_class_ap75),
        "per_class": per_class_ap,
    }


def check_expected_results(results: Dict, expected_results, sigma_tol: float):
    """Regression assertion (reference coco_eval.py check_expected_results):
    each expected entry is (metric, mean, std); fails when
    |actual - mean| > sigma_tol * std."""
    errors = []
    for metric, mean, std in expected_results:
        actual = results[metric]
        lo, hi = mean - sigma_tol * std, mean + sigma_tol * std
        if not (lo <= actual <= hi):
            errors.append(
                f"{metric}: {actual:.4f} outside [{lo:.4f}, {hi:.4f}]"
            )
    if errors:
        raise AssertionError("; ".join(errors))
