import json

import numpy as np
import pytest

from abr_iod_tpu.data.voc2012_instance import VOC2012InstanceDataSource
from abr_iod_tpu.evaluation.voc_eval_inst import eval_instance_seg_voc, mask_iou


def test_mask_iou():
    a = np.zeros((1, 8, 8), bool)
    a[0, :4, :4] = True
    b = np.zeros((2, 8, 8), bool)
    b[0, :4, :4] = True
    b[1, 2:6, 2:6] = True
    iou = mask_iou(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(4 / (16 + 16 - 4))


def test_instance_eval_perfect_and_miss():
    m1 = np.zeros((16, 16), bool)
    m1[2:10, 2:10] = True
    m2 = np.zeros((16, 16), bool)
    m2[10:15, 10:15] = True
    gt = [{"masks": np.stack([m1, m2]), "labels": np.array([1, 1])}]
    pred = [{"masks": np.stack([m1]), "labels": np.array([1]),
             "scores": np.array([0.9])}]
    res = eval_instance_seg_voc(pred, gt)
    assert res["ap"][1] == pytest.approx(0.5)


def test_voc2012_instance_source(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(img_dir / "a.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 32, "width": 48}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [4, 4, 20, 16], "iscrowd": 0, "area": 320,
             "segmentation": [[4, 4, 24, 4, 24, 20, 4, 20]]},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(ann))
    src = VOC2012InstanceDataSource(str(f), str(img_dir), is_train=True,
                                    num_old_categories=0, num_new_categories=1)
    assert len(src) == 1
    rec = src.annotation(0)
    assert rec["masks"].shape == (1, 32, 48)
    assert rec["masks"][0, 10, 10]
    assert not rec["masks"][0, 30, 40]


def test_instance_eval_matches_reference_restatement_randomized():
    """Differential oracle: an independent restatement of the reference's
    voc_eval_inst.py (masklist_iou pixel IoU, the double-+1 box IoU,
    greedy matching per threshold, AP averaged over the NINE
    arange(0.5, 0.95, 0.05) thresholds - .95 excluded) vs ours."""
    from collections import defaultdict

    from abr_iod_tpu.evaluation.voc_eval import calc_detection_voc_ap

    def ref_iou_box(a, b):  # boxlist_iou on pre-incremented maxima
        tl = np.maximum(a[:, None, :2], b[None, :, :2])
        br = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(br - tl + 1, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area = lambda x: (x[:, 2] - x[:, 0] + 1) * (x[:, 3] - x[:, 1] + 1)
        return inter / (area(a)[:, None] + area(b)[None] - inter)

    def ref_iou_mask(gt_m, pr_m):  # masklist_iou (voc_eval_inst.py:90-106)
        ious = np.zeros((len(pr_m), len(gt_m)))
        for p in range(len(pr_m)):
            for t in range(len(gt_m)):
                tp = np.sum(gt_m[t] & pr_m[p])
                fp = np.sum(~gt_m[t] & pr_m[p])
                fn = np.sum(gt_m[t] & ~pr_m[p])
                ious[p][t] = tp / (tp + fp + fn) if tp + fp + fn else 0.0
        return ious

    def ref_eval(preds, gts):
        thresholds = np.arange(0.5, 0.95, 0.05)
        stacks = {"mask": [], "box": []}
        for thr in thresholds:
            n_pos = defaultdict(int)
            score = defaultdict(list)
            match = {"mask": defaultdict(list), "box": defaultdict(list)}
            for pred, gt in zip(preds, gts):
                for l in np.unique(np.concatenate(
                        (pred["labels"], gt["labels"])).astype(int)):
                    pm = pred["labels"] == l
                    order = pred["scores"][pm].argsort()[::-1]
                    ps = pred["scores"][pm][order]
                    pb = pred["boxes"][pm][order]
                    pmk = pred["masks"][pm][order]
                    gm = gt["labels"] == l
                    gb, gmk = gt["boxes"][gm], gt["masks"][gm]
                    n_pos[l] += len(gb)
                    score[l].extend(ps)
                    if len(ps) == 0:
                        continue
                    if len(gb) == 0:
                        for w in match.values():
                            w[l].extend([0] * len(ps))
                        continue
                    pb2, gb2 = pb.copy(), gb.copy()
                    pb2[:, 2:] += 1
                    gb2[:, 2:] += 1
                    for which, iou in (("box", ref_iou_box(pb2, gb2)),
                                       ("mask", ref_iou_mask(gmk, pmk))):
                        gi = iou.argmax(axis=1)
                        gi[iou.max(axis=1) < thr] = -1
                        selec = np.zeros(len(gb), bool)
                        for g in gi:
                            if g >= 0:
                                match[which][l].append(
                                    1 if not selec[g] else 0)
                                selec[g] = True
                            else:
                                match[which][l].append(0)
            n_cls = max(n_pos.keys()) + 1
            for which in ("mask", "box"):
                prec = [None] * n_cls
                rec = [None] * n_cls
                for l in n_pos.keys():
                    sl = np.asarray(score[l])
                    ml = np.asarray(match[which][l], np.int8)
                    o = sl.argsort()[::-1]
                    ml = ml[o]
                    tp, fp = np.cumsum(ml == 1), np.cumsum(ml == 0)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        prec[l] = tp / (fp + tp)
                    if n_pos[l] > 0:
                        rec[l] = tp / n_pos[l]
                stacks[which].append(calc_detection_voc_ap(prec, rec))
        # the oracle restatement keeps numpy's nanmean; silence its
        # all-NaN-slice warning so the suite stays clean under -W error
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            return {k: np.nanmean(np.stack(v), axis=0)
                    for k, v in stacks.items()}

    for seed in range(3):
        rng = np.random.RandomState(40 + seed)
        preds, gts = [], []
        H, W = 48, 64
        for _ in range(6):
            ng = rng.randint(1, 4)
            gb = np.zeros((ng, 4), np.float32)
            gmk = np.zeros((ng, H, W), bool)
            for j in range(ng):
                x1, y1 = rng.randint(0, 30), rng.randint(0, 20)
                x2, y2 = x1 + rng.randint(10, 30), y1 + rng.randint(10, 24)
                gb[j] = [x1, y1, min(x2, W - 1), min(y2, H - 1)]
                gmk[j, y1:y2, x1:x2] = True
            gl = rng.randint(1, 4, ng)
            gts.append({"boxes": gb, "labels": gl, "masks": gmk})
            nd = rng.randint(0, 6)
            pb = np.zeros((nd, 4), np.float32)
            pmk = np.zeros((nd, H, W), bool)
            for j in range(nd):
                src = gb[rng.randint(ng)]
                jit = rng.randint(-8, 9, 4)
                x1 = int(np.clip(src[0] + jit[0], 0, W - 12))
                y1 = int(np.clip(src[1] + jit[1], 0, H - 12))
                x2 = int(np.clip(src[2] + jit[2], x1 + 6, W - 1))
                y2 = int(np.clip(src[3] + jit[3], y1 + 6, H - 1))
                pb[j] = [x1, y1, x2, y2]
                pmk[j, y1:y2, x1:x2] = True
            pl = rng.randint(1, 4, nd)
            ps = np.round(rng.uniform(size=nd).astype(np.float32), 1)
            preds.append({"boxes": pb, "labels": pl, "masks": pmk,
                          "scores": ps})
        want = ref_eval(preds, gts)
        got = eval_instance_seg_voc(preds, gts)
        np.testing.assert_allclose(got["ap"], want["mask"], rtol=1e-9,
                                   err_msg=f"seed {seed} mask")
        np.testing.assert_allclose(got["ap_box"], want["box"], rtol=1e-9,
                                   err_msg=f"seed {seed} box")
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            want_map = np.nanmean(want["mask"])
        np.testing.assert_allclose(got["map"], want_map)
