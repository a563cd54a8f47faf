"""COCO-style detection evaluation, implemented natively.

Reference: data/datasets/evaluation/coco/coco_eval.py (a pycocotools
wrapper + the EXPECTED_RESULTS regression assertion, :436).  This
environment has no pycocotools, so the COCOeval bbox protocol is
implemented directly in numpy, covering the FULL summarize() suite the
reference reports (COCOResults.METRICS, coco_eval.py:387-405): AP /
AP50 / AP75, area-range APs / APm / APl, and AR@1 / AR@10 / AR@100 plus
ARs / ARm / ARl — 101-point interpolated precision averaged over IoU
thresholds .50:.05:.95, greedy score-ordered matching with area-range
gt/det ignore semantics.

The greedy matcher is vectorized over gts and IoU thresholds (one
python loop over detections only), so a multi-thousand-image eval
finishes in seconds instead of the minutes the naive O(P*G*T) triple
loop took.

``check_expected_results`` mirrors the reference's sigma-tolerance
regression gate (coco_eval.py check_expected_results).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _nanmean(a) -> float:
    """np.nanmean that stays silent on all-NaN input (classes absent from
    an area range / with no GTs produce all-NaN AP/AR rows; numpy's
    nanmean would warn `Mean of empty slice` for them)."""
    a = np.asarray(a, dtype=np.float64)
    m = ~np.isnan(a)
    return float(a[m].mean()) if m.any() else float("nan")


def _iou_xyxy(a: np.ndarray, b: np.ndarray, crowd_b=None) -> np.ndarray:
    """pycocotools maskUtils.iou semantics: for a crowd gt column the
    union is the DETECTION's area (a det fully inside a crowd region has
    IoU 1 regardless of the crowd's size)."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    if crowd_b is not None and np.any(crowd_b):
        union = np.where(crowd_b[None, :], area_a[:, None], union)
    return inter / np.where(union > 0, union, 1.0)


def _box_area(boxes: np.ndarray) -> np.ndarray:
    return np.prod(np.clip(boxes[:, 2:4] - boxes[:, :2], 0, None), axis=1)


def _gt_npig(gt_areas, gt_crowd, area_rng) -> int:
    """Count of considered (non-ignored) gts — the no-detections fast path."""
    lo, hi = area_rng
    return int((~(gt_crowd | (gt_areas < lo) | (gt_areas > hi))).sum())


def _match_image(pred, gt, area_rng, max_dets: int, iou_full=None,
                 gt_crowd=None, gt_areas=None, det_areas=None):
    """Greedy COCOeval matching for one image and one class, all IoU
    thresholds at once (the per-det loop is the only python loop —
    gt candidates and thresholds are vectorized).

    pred: [D, 5] (x1,y1,x2,y2,score) score-sorted desc; gt: [G, 4];
    iou_full: optional precomputed IoU [len(pred), G] in the ORIGINAL
    det/gt order (computed once per (image, class) and reused across
    area ranges, like pycocotools' computeIoU cache); gt_crowd [G] bool —
    crowd regions are always-ignored AND may match multiple detections
    (COCOeval evaluateImg: `gtm > 0 and not iscrowd -> continue`).
    Returns (scores [D], tp [T, D], ignore [T, D], n_gt_considered).
    """
    lo, hi = area_rng
    T = len(IOU_THRESHOLDS)
    # the json 'area' (segmentation area) buckets gts when provided —
    # pycocotools uses g['area'], not the bbox area
    gt_area = _box_area(gt) if gt_areas is None else np.asarray(gt_areas)
    if gt_crowd is None:
        gt_crowd = np.zeros(len(gt), bool)
    gt_ig = gt_crowd | (gt_area < lo) | (gt_area > hi)
    # non-ignored gts first (COCOeval sorts by _ignore): the matcher
    # prefers any qualifying non-ignored gt over ignored ones
    order_g = np.argsort(gt_ig, kind="stable")
    gt, gt_ig, gt_crowd = gt[order_g], gt_ig[order_g], np.asarray(gt_crowd)[order_g]
    npig = int((~gt_ig).sum())

    p = pred[:max_dets]
    D, G = len(p), len(gt)
    if D == 0:
        return (np.zeros((0,)), np.zeros((T, 0), bool), np.zeros((T, 0), bool),
                npig)
    if iou_full is not None:
        iou = iou_full[:max_dets][:, order_g] if G else np.zeros((D, 0))
    else:
        iou = _iou_xyxy(p[:, :4], gt, gt_crowd) if G else np.zeros((D, 0))
    thr = IOU_THRESHOLDS[:, None]  # [T, 1]

    matched = np.zeros((T, G), bool)
    match_j = np.full((T, D), -1, np.int64)
    t_idx = np.arange(T)
    # only dets that clear the lowest threshold for SOME gt can ever
    # match — the rest are unmatched at every threshold (pure FPs)
    candidates = (
        np.nonzero(iou.max(axis=1) >= IOU_THRESHOLDS[0])[0] if G else ()
    )
    for i in candidates:
        cand = (~matched) & (iou[i][None, :] >= thr)  # [T, G]
        # prefer non-ignored candidates; fall back to ignored ones
        cand_ni = cand & ~gt_ig[None, :]
        use_ni = cand_ni.any(axis=1)
        pool = np.where(use_ni[:, None], cand_ni, cand)
        vals = np.where(pool, iou[i][None, :], -1.0)
        # pycocotools keeps the LAST gt among equal-IoU candidates (its
        # scan replaces the best on `>=`); argmax takes the first, so
        # argmax over the reversed axis
        j = G - 1 - vals[:, ::-1].argmax(axis=1)
        ok = vals[t_idx, j] >= 0
        match_j[ok, i] = j[ok]
        # crowd gts stay available for further detections
        ok_nc = ok & ~gt_crowd[j]
        matched[t_idx[ok_nc], j[ok_nc]] = True

    p_area = _box_area(p) if det_areas is None else det_areas[:max_dets]
    det_out = (p_area < lo) | (p_area > hi)  # [D]
    has_m = match_j >= 0
    matched_ig = np.zeros((T, D), bool)
    if G:
        matched_ig = np.where(has_m, gt_ig[match_j.clip(0)], False)
    ignore = np.where(has_m, matched_ig, det_out[None, :])
    tp = has_m & ~matched_ig
    return p[:, 4], tp, ignore, npig


def _accumulate(per_image, npig, max_dets: int):
    """Merge per-image match results (truncated to max_dets — dets are
    score-sorted per image, so the prefix equals matching with fewer
    dets, as in COCOeval.accumulate) into (ap [T], recall [T])."""
    T = len(IOU_THRESHOLDS)
    scores = np.concatenate([s[:max_dets] for s, _, _ in per_image]) \
        if per_image else np.zeros((0,))
    tp = np.concatenate([t[:, :max_dets] for _, t, _ in per_image], axis=1) \
        if per_image else np.zeros((T, 0), bool)
    ig = np.concatenate([g[:, :max_dets] for _, _, g in per_image], axis=1) \
        if per_image else np.zeros((T, 0), bool)

    ap = np.full((T,), np.nan)
    recall = np.full((T,), np.nan)
    if npig == 0:
        return ap, recall
    order = np.argsort(-scores, kind="stable")
    tp, ig = tp[:, order], ig[:, order]
    for ti in range(T):
        keep = ~ig[ti]
        tpt = tp[ti][keep].astype(np.float64)
        if tpt.size == 0:
            ap[ti], recall[ti] = 0.0, 0.0
            continue
        tp_cum = np.cumsum(tpt)
        fp_cum = np.cumsum(1.0 - tpt)
        rec = tp_cum / npig
        prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        # precision envelope (vectorized reverse cummax) + 101-pt interp
        prec = np.maximum.accumulate(prec[::-1])[::-1]
        idx = np.searchsorted(rec, RECALL_THRESHOLDS, side="left")
        q = np.where(idx < len(prec), prec[np.clip(idx, 0, len(prec) - 1)], 0.0)
        ap[ti] = q.mean()
        recall[ti] = rec[-1]
    return ap, recall


def eval_detection_coco(predictions: List[Dict], ground_truths: List[Dict],
                        max_dets: int = 100) -> Dict:
    """predictions[i]: {'boxes','labels','scores'};
    ground_truths[i]: {'boxes','labels', optional 'iscrowd', optional
    'areas'} — crowd gts are ignore regions per the pycocotools protocol
    (det-area IoU, multi-match, never counted as positives); 'areas'
    carries the json segmentation areas for S/M/L bucketing (bbox area
    otherwise).  Returns the full COCO
    metric suite (AP/AP50/AP75/APs/APm/APl, AR1/AR10/AR100/ARs/ARm/ARl)
    and per-class AP."""
    labels_all = set()
    for gt in ground_truths:
        labels_all.update(np.unique(gt["labels"]).tolist())
    labels_all = sorted(int(l) for l in labels_all if l > 0)

    # group detections/gts by label ONCE per image (the naive per-(class,
    # image) masking re-scans every label array n_classes times — the
    # dominant cost at COCO scale, 80 classes x 5k images)
    def _group(labels):
        order = np.argsort(labels, kind="stable")
        uniq, starts = np.unique(labels[order], return_index=True)
        splits = np.split(order, starts[1:])
        return {int(u): s for u, s in zip(uniq, splits)}

    pred_by_label, gt_by_label, gt_crowd_all, gt_area_all = [], [], [], []
    for pred, gt in zip(predictions, ground_truths):
        pred_by_label.append(_group(np.asarray(pred["labels"])))
        gt_by_label.append(_group(np.asarray(gt["labels"])))
        gt_crowd_all.append(np.asarray(
            gt.get("iscrowd", np.zeros(len(gt["labels"]), bool))
        ).astype(bool))
        gt_area_all.append(
            np.asarray(gt["areas"], np.float64) if "areas" in gt
            else _box_area(np.asarray(gt["boxes"], np.float64))
        )

    per_class_ap, per_class_ap50, per_class_ap75 = {}, {}, {}
    area_aps = {k: [] for k in AREA_RANGES}
    recalls = {k: [] for k in ("AR1", "AR10", "AR100", "ARs", "ARm", "ARl")}

    for l in labels_all:
        work = []  # images with detections of class l
        gt_only = []  # images with only gts of class l (count npig, no match)
        for i, (pred, gt) in enumerate(zip(predictions, ground_truths)):
            pi = pred_by_label[i].get(l)
            gi = gt_by_label[i].get(l)
            if pi is None and gi is None:
                continue  # contributes nothing at any area range
            g = gt["boxes"][gi] if gi is not None else np.zeros((0, 4))
            crowd = gt_crowd_all[i][gi] if gi is not None else np.zeros(0, bool)
            ga = gt_area_all[i][gi] if gi is not None else np.zeros((0,))
            if pi is None:
                gt_only.append((ga, crowd))
                continue
            p = np.concatenate(
                [pred["boxes"][pi], pred["scores"][pi, None]], axis=1
            )
            p = p[np.argsort(-p[:, 4], kind="stable")]
            # IoU + det areas once per (image, class), reused across area
            # ranges (pycocotools computeIoU cache)
            iou = (_iou_xyxy(p[:, :4], g, crowd)
                   if len(g) else np.zeros((len(p), 0)))
            work.append((p, g, crowd, ga, _box_area(p), iou))

        for area, rng in AREA_RANGES.items():
            per_image = []
            npig = sum(_gt_npig(ga, crowd, rng) for ga, crowd in gt_only)
            for p, g, crowd, ga, dareas, iou in work:
                s, tp, ig, n = _match_image(p, g, rng, max_dets, iou_full=iou,
                                            gt_crowd=crowd, gt_areas=ga,
                                            det_areas=dareas)
                per_image.append((s, tp, ig))
                npig += n
            ap, rec = _accumulate(per_image, npig, max_dets)
            if area == "all":
                per_class_ap[l] = _nanmean(ap)
                per_class_ap50[l] = float(ap[0])
                per_class_ap75[l] = float(ap[5])
                recalls["AR100"].append(_nanmean(rec))
                for k, md in (("AR10", 10), ("AR1", 1)):
                    _, r = _accumulate(per_image, npig, md)
                    recalls[k].append(_nanmean(r))
            else:
                short = {"small": "ARs", "medium": "ARm", "large": "ARl"}[area]
                recalls[short].append(_nanmean(rec))
                area_aps[area].append(_nanmean(ap))

    def avg(vals):
        vals = [v for v in vals if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    out = {
        "AP": avg(per_class_ap.values()),
        "AP50": avg(per_class_ap50.values()),
        "AP75": avg(per_class_ap75.values()),
        "APs": avg(area_aps["small"]),
        "APm": avg(area_aps["medium"]),
        "APl": avg(area_aps["large"]),
        "per_class": per_class_ap,
    }
    for k, vals in recalls.items():
        out[k] = avg(vals)
    return out


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
