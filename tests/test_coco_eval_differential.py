"""Randomized differential oracle for the COCO evaluator.

An independent scalar restatement of pycocotools' COCOeval (the
reference's protocol, data/datasets/evaluation/coco/coco_eval.py:366-430
drives `pycocotools.cocoeval`): evaluateImg's det-order greedy loop with
the exact continue/break rules, crowd semantics (det-area IoU,
multi-match, always-ignored), segmentation-area S/M/L bucketing,
mergesort score ordering, the 101-point interpolated AP, and AR@k — run
against abr_iod_tpu's vectorized evaluator on randomized datasets.
"""

import numpy as np
import pytest

from abr_iod_tpu.evaluation.coco_eval import eval_detection_coco

# the restatement keeps numpy's plain nanmean (pycocotools semantics);
# its all-NaN-slice warning is expected, keep the suite clean under -W
pytestmark = pytest.mark.filterwarnings("ignore:Mean of empty slice")

T_THRS = np.linspace(0.5, 0.95, 10)
R_THRS = np.linspace(0.0, 1.0, 101)
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _bbox_area(b):
    return max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)


def _iou_one(d, g, crowd):
    """maskUtils.iou for one pair (bbox mode)."""
    ix = max(0.0, min(d[2], g[2]) - max(d[0], g[0]))
    iy = max(0.0, min(d[3], g[3]) - max(d[1], g[1]))
    inter = ix * iy
    da, ga = _bbox_area(d), _bbox_area(g)
    union = da if crowd else da + ga - inter
    return inter / union if union > 0 else 0.0


def _ref_evaluate_img(dts, gts, crowd, gareas, rng, max_det):
    """cocoeval.py evaluateImg restated (scalar loops, det order)."""
    D = min(len(dts), max_det)
    gt_ig0 = [bool(crowd[j]) or gareas[j] < rng[0] or gareas[j] > rng[1]
              for j in range(len(gts))]
    order_g = sorted(range(len(gts)), key=lambda j: gt_ig0[j])
    G = len(order_g)
    gtIg = [gt_ig0[j] for j in order_g]
    iscrowd = [bool(crowd[j]) for j in order_g]
    ious = np.array([[_iou_one(dts[i][:4], gts[j], crowd[j])
                      for j in order_g] for i in range(D)]) \
        if D and G else np.zeros((D, G))

    Tn = len(T_THRS)
    gtm = np.zeros((Tn, G), np.int64)
    dtm = np.zeros((Tn, D), np.int64)
    dtIg = np.zeros((Tn, D), bool)
    for tind, t in enumerate(T_THRS):
        for dind in range(D):
            best = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not iscrowd[gind]:
                    continue
                if m > -1 and not gtIg[m] and gtIg[gind]:
                    break
                if ious[dind, gind] < best:
                    continue
                best = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dtIg[tind, dind] = gtIg[m]
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
    # unmatched dets outside the area range are ignored
    d_out = np.array([_bbox_area(dts[i][:4]) < rng[0]
                      or _bbox_area(dts[i][:4]) > rng[1] for i in range(D)])
    dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, d_out[None, :]))
    npig = sum(1 for ig in gtIg if not ig)
    scores = np.array([dts[i][4] for i in range(D)])
    return scores, dtm, dtIg, npig


def _ref_accumulate(per_image, npig):
    """cocoeval.py accumulate for one (cat, area, maxDet)."""
    Tn = len(T_THRS)
    ap = np.full(Tn, np.nan)
    rec = np.full(Tn, np.nan)
    if npig == 0:
        return ap, rec
    scores = np.concatenate([s for s, _, _ in per_image]) \
        if per_image else np.zeros((0,))
    inds = np.argsort(-scores, kind="mergesort")
    dtm = np.concatenate([m for _, m, _ in per_image], axis=1)[:, inds] \
        if per_image else np.zeros((Tn, 0))
    dtIg = np.concatenate([g for _, _, g in per_image], axis=1)[:, inds] \
        if per_image else np.zeros((Tn, 0), bool)
    tps = (dtm > 0) & ~dtIg
    fps = (dtm == 0) & ~dtIg
    for t in range(Tn):
        tp = np.cumsum(tps[t]).astype(float)
        fp = np.cumsum(fps[t]).astype(float)
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros(len(R_THRS))
        rec[t] = rc[-1] if nd else 0.0
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds_r = np.searchsorted(rc, R_THRS, side="left")
        for ri, pi in enumerate(inds_r):
            if pi < nd:
                q[ri] = pr[pi]
        ap[t] = q.mean()
    return ap, rec


def _ref_eval(predictions, ground_truths, max_dets=100):
    cats = sorted({int(l) for gt in ground_truths
                   for l in np.unique(gt["labels"]) if l > 0})
    per_class_ap, per_class_ap50, per_class_ap75 = {}, {}, {}
    area_aps = {k: [] for k in AREAS}
    recalls = {k: [] for k in ("AR1", "AR10", "AR100", "ARs", "ARm", "ARl")}
    for l in cats:
        per_img_cache = {}
        for area, rng in AREAS.items():
            for md in ((100, 10, 1) if area == "all" else (100,)):
                per_image, npig = [], 0
                for pred, gt in zip(predictions, ground_truths):
                    pm = pred["labels"] == l
                    dts = np.concatenate(
                        [pred["boxes"][pm], pred["scores"][pm, None]], axis=1) \
                        if pm.any() else np.zeros((0, 5))
                    dts = dts[np.argsort(-dts[:, 4], kind="mergesort")]
                    gm = gt["labels"] == l
                    gts = gt["boxes"][gm]
                    crowd = np.asarray(gt["iscrowd"])[gm] \
                        if "iscrowd" in gt else np.zeros(len(gts), bool)
                    gareas = np.asarray(gt["areas"])[gm] if "areas" in gt \
                        else np.array([_bbox_area(g) for g in gts])
                    s, dtm, dtIg, n = _ref_evaluate_img(
                        dts, gts, crowd, gareas, rng, md)
                    per_image.append((s, dtm, dtIg))
                    npig += n
                ap, rec = _ref_accumulate(per_image, npig)
                if area == "all" and md == 100:
                    per_class_ap[l] = float(np.nanmean(ap))
                    per_class_ap50[l] = float(ap[0])
                    per_class_ap75[l] = float(ap[5])
                    recalls["AR100"].append(np.nanmean(rec))
                elif area == "all":
                    recalls[f"AR{md}"].append(np.nanmean(rec))
                else:
                    short = {"small": "ARs", "medium": "ARm",
                             "large": "ARl"}[area]
                    recalls[short].append(np.nanmean(rec))
                if md == 100:
                    area_aps[area].append(np.nanmean(ap))

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


def _random_coco_dataset(rng, n_images, n_classes, crowd_frac=0.2):
    preds, gts = [], []
    for _ in range(n_images):
        ng = rng.randint(0, 6)
        gb = np.zeros((ng, 4), np.float32)
        side = np.exp(rng.uniform(np.log(10), np.log(200), ng))
        gb[:, 0] = rng.uniform(0, 300, ng)
        gb[:, 1] = rng.uniform(0, 200, ng)
        gb[:, 2] = gb[:, 0] + side
        gb[:, 3] = gb[:, 1] + side * rng.uniform(0.5, 1.5, ng)
        gl = rng.randint(1, n_classes + 1, ng)
        gc = rng.uniform(size=ng) < crowd_frac
        # simulated segmentation areas differ from the bbox areas
        ga = np.array([_bbox_area(b) for b in gb]) * rng.uniform(0.55, 1.0, ng)
        gts.append({"boxes": gb, "labels": gl, "iscrowd": gc, "areas": ga})

        nd = rng.randint(0, 12)
        pb = np.zeros((nd, 4), np.float32)
        for j in range(nd):
            if ng and rng.uniform() < 0.7:
                src = gb[rng.randint(ng)]
                w = src[2] - src[0]
                jit = rng.uniform(-0.25, 0.25, 4) * w
                pb[j] = src + jit
                pb[j, 2] = max(pb[j, 2], pb[j, 0] + 4)
                pb[j, 3] = max(pb[j, 3], pb[j, 1] + 4)
            else:
                s = np.exp(rng.uniform(np.log(10), np.log(180)))
                pb[j, 0] = rng.uniform(0, 300)
                pb[j, 1] = rng.uniform(0, 200)
                pb[j, 2] = pb[j, 0] + s
                pb[j, 3] = pb[j, 1] + s * rng.uniform(0.6, 1.4)
        pl = rng.randint(1, n_classes + 1, nd)
        ps = np.round(rng.uniform(size=nd).astype(np.float32), 1)  # ties
        preds.append({"boxes": pb, "labels": pl, "scores": ps})
    return preds, gts


def test_coco_eval_matches_pycocotools_restatement_randomized():
    for seed in range(4):
        rng = np.random.RandomState(100 + seed)
        preds, gts = _random_coco_dataset(rng, n_images=8, n_classes=4)
        want = _ref_eval(preds, gts)
        got = eval_detection_coco(preds, gts)
        for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
                  "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"):
            w, g = want[k], got[k]
            if np.isnan(w):
                assert np.isnan(g), (seed, k, g)
            else:
                np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12,
                                           err_msg=f"seed {seed} {k}")
        assert set(got["per_class"]) == set(want["per_class"])
        for l in want["per_class"]:
            np.testing.assert_allclose(
                got["per_class"][l], want["per_class"][l], rtol=1e-9,
                err_msg=f"seed {seed} class {l}")


def test_crowd_region_absorbs_detections():
    """Two detections inside one crowd region: neither TP nor FP; a
    genuine gt elsewhere still reaches AP 1.0 (multi-match + det-area
    IoU: the small dets overlap little of the big crowd box)."""
    gt = {"boxes": np.asarray([[0, 0, 200, 200], [300, 300, 340, 340]],
                              np.float32),
          "labels": np.asarray([1, 1]),
          "iscrowd": np.asarray([True, False])}
    pred = {"boxes": np.asarray([[10, 10, 40, 40], [100, 100, 140, 140],
                                 [301, 301, 339, 339]], np.float32),
            "labels": np.asarray([1, 1, 1]),
            "scores": np.asarray([0.9, 0.8, 0.7], np.float32)}
    out = eval_detection_coco([pred], [gt])
    assert out["AP50"] == 1.0, out  # crowd dets ignored, real det matches
    # without the crowd flag the two region dets are FPs ranked above the
    # real match - AP drops
    gt2 = dict(gt, iscrowd=np.asarray([False, False]))
    out2 = eval_detection_coco([pred], [gt2])
    assert out2["AP50"] < 1.0, out2


def test_tied_iou_prefers_the_last_gt_like_pycocotools():
    """Exact-tie discrimination (cocoeval's scan replaces best on >=): det1
    ties between gts A and B; det2 overlaps only A. Matching det1 to the
    LAST tied gt (B) leaves A for det2 -> both TP; first-tie matching
    would burn A on det1 and strand det2."""
    gt = {"boxes": np.asarray([[0, 0, 40, 40], [20, 0, 60, 40]], np.float32),
          "labels": np.asarray([1, 1])}
    pred = {"boxes": np.asarray([[10, 0, 50, 40], [0, 0, 36, 40]], np.float32),
            "labels": np.asarray([1, 1]),
            "scores": np.asarray([0.9, 0.8], np.float32)}
    got = eval_detection_coco([pred], [gt])
    want = _ref_eval([pred], [gt])
    np.testing.assert_allclose(got["AP50"], want["AP50"])
    assert got["AP50"] == 1.0, got["AP50"]


def test_coco_eval_differential_with_frequent_ties():
    """Grid-snapped boxes produce many exact IoU ties (incl. duplicated
    gts); the differential must still agree to 1e-9."""
    for seed in range(3):
        rng = np.random.RandomState(200 + seed)
        preds, gts = _random_coco_dataset(rng, n_images=6, n_classes=3)
        for d in preds + gts:
            d["boxes"] = np.round(d["boxes"] / 16.0) * 16.0
        for g in gts:  # duplicate one gt per image when present
            if len(g["boxes"]):
                for k in ("boxes", "labels", "iscrowd", "areas"):
                    g[k] = np.concatenate([g[k], g[k][:1]])
        want = _ref_eval(preds, gts)
        got = eval_detection_coco(preds, gts)
        for k in ("AP", "AP50", "AP75", "AR100"):
            w = want[k]
            if np.isnan(w):
                assert np.isnan(got[k]), (seed, k)
            else:
                np.testing.assert_allclose(got[k], w, rtol=1e-9,
                                           err_msg=f"seed {seed} {k}")
