"""Full FPN incremental TRAIN-STEP parity vs an independent torch oracle.

The FPN-family analogue of test_train_parity.py, pinning the path that
round 3 enabled (engine/incremental.py generate_soften_proposals_fpn +
fpn_forward_detection_losses): ONE complete ABR incremental iteration on
an FPN backbone — teacher per-level proposal selection + cross-level
merge, soften head over multi-level pooled features, student RPN loss
over concatenated per-level anchors, train-mode proposal selection +
gt append, RoI matching/(take-all) sampling, inclusive CE + box losses
through the 2-MLP head, 'id' + ARD distillation on the level-mapped
pools, PER-LEVEL RPN distillation (DIST.RPN), and the SGD update — all
against a torch/numpy re-statement of the reference loop.

RNG is sidestepped like the C4 parity test: every sampling quota is >=
its candidate count, so both sides deterministically take ALL candidates
and the losses are order-invariant sums over identical sets (the FPN
soften 'pick' then merely permutes the full set).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from abr_iod_tpu.config import get_default_config
from abr_iod_tpu.engine import Batch, TrainState
from abr_iod_tpu.engine.incremental import make_incremental_train_step
from abr_iod_tpu.models.anchors import grid_anchors
from abr_iod_tpu.models.fpn_detector import FPN_STRIDES, build_fpn_detector
from abr_iod_tpu.solver.optim import make_optimizer
from tests.test_full_model_parity import _randomize
from tests.torch_ref_fpn import TorchRefFPN, copy_flax_fpn_params_to_torch, \
    fpn_roi_align_np
from tests.torch_ref_model import select_proposals_np
from tests.torch_ref_train import (
    BELOW, BETWEEN, anchor_visibility_np, ard_torch, encode_np,
    id_distillation_torch, inclusive_ce_torch, iou_np, make_reference_sgd,
    match_np, smooth_l1_t,
)

pytestmark = pytest.mark.slow  # compile-heavy tier

CANVAS = (64, 96)
STAGES = (1, 1, 1, 1)
WPG, RES2, FPN_OUT, REP = 8, 16, 32, 64
N_OLD = 2
C_TEACHER, C_STUDENT = N_OLD + 1, N_OLD + 3
ANCHOR_SIZES = (8, 16, 32, 64, 128)
RATIOS = (0.5, 1.0)
PRE_NMS, POST_NMS = 64, 16      # per level
FPN_POST_TRAIN, FPN_POST_TEST = 24, 24
SOFTEN = 16                      # == KEEP: take-all (permutation only)
ROI_BATCH = 64                   # > FPN_POST_TRAIN + MAX_GT
RPN_BATCH = 2048                 # > total anchors (1024): take-all
LR, MOMENTUM, WD, BIAS_LR, WD_BIAS = 0.02, 0.9, 1e-4, 2.0, 0.0
ALPHA, BETA, GAMMA = 0.5, 1.0, 1.0


def _cfg():
    cfg = get_default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = C_STUDENT
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = REP
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = WPG
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = RES2
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = FPN_OUT
    cfg.MODEL.RPN.ANCHOR_SIZES = ANCHOR_SIZES
    cfg.MODEL.RPN.ASPECT_RATIOS = RATIOS
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = POST_NMS
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = FPN_POST_TRAIN
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = FPN_POST_TEST
    cfg.MODEL.RPN.MIN_SIZE = 0
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = RPN_BATCH
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = ROI_BATCH
    cfg.DIST.TYPE = "id"
    cfg.DIST.FEAT = "ard"
    cfg.DIST.RPN = True
    cfg.DIST.ALPHA, cfg.DIST.BETA, cfg.DIST.GAMMA = ALPHA, BETA, GAMMA
    cfg.SOLVER.BASE_LR = LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WD
    cfg.SOLVER.BIAS_LR_FACTOR = BIAS_LR
    cfg.SOLVER.WEIGHT_DECAY_BIAS = WD_BIAS
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = ()
    cfg.TPU.CANVAS_TRAIN = CANVAS
    cfg.TPU.CANVAS_TEST = CANVAS
    cfg.TPU.FPN_BACKBONE_STAGES = STAGES
    cfg.TPU.MAX_GT = 8
    cfg.TPU.SOFTEN_TOPK = SOFTEN
    cfg.TPU.SOFTEN_KEEP = SOFTEN
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.ROI_ALIGN_PRECISION = "highest"
    return cfg


def _gts():
    gt_boxes = np.zeros((2, 8, 4), np.float32)
    gt_labels = np.zeros((2, 8), np.int32)
    gt_mask = np.zeros((2, 8), bool)
    raw = [
        [(6, 8, 33, 35, 3), (35, 20, 70, 50, 4), (15, 40, 45, 60, 3)],
        [(20, 5, 60, 33, 4), (4, 30, 28, 59, 3)],
    ]
    for i, items in enumerate(raw):
        for j, (x1, y1, x2, y2, c) in enumerate(items):
            gt_boxes[i, j] = [x1, y1, x2, y2]
            gt_labels[i, j] = c
            gt_mask[i, j] = True
    return gt_boxes, gt_labels, gt_mask


def _flatten_level(obj_t, reg_t):
    """torch [B,A,H,W]/[B,4A,H,W] -> per-image [HWA]/[HWA,4]."""
    b, a, h, w = obj_t.shape
    o = obj_t.permute(0, 2, 3, 1).reshape(b, -1)
    r = reg_t.permute(0, 2, 3, 1).reshape(b, h * w, a, 4).reshape(b, -1, 4)
    return o, r


@pytest.fixture(scope="module")
def parity():
    cfg = _cfg()
    cfg_teacher = cfg.clone()
    cfg_teacher.MODEL.ROI_BOX_HEAD.NUM_CLASSES = C_TEACHER

    model_s = build_fpn_detector(cfg)
    model_t = build_fpn_detector(cfg_teacher)
    px0 = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    rois0 = jnp.zeros((1, 4, 4)) + 16.0
    params_s = _randomize(
        jax.jit(model_s.init)(jax.random.PRNGKey(0), px0, rois0), seed=21)
    params_t = _randomize(
        jax.jit(model_t.init)(jax.random.PRNGKey(1), px0, rois0), seed=19)

    rng = np.random.RandomState(6)
    images = rng.uniform(-100, 100, (2, *CANVAS, 3)).astype(np.float32)
    gt_boxes, gt_labels, gt_mask = _gts()

    # ---- our fused jit step
    tx = make_optimizer(cfg, params_s)
    state = TrainState(
        jax.tree_util.tree_map(jnp.asarray, params_s),
        tx.init(params_s), jnp.zeros((), jnp.int32))
    step, _ = make_incremental_train_step(
        model_t, model_s, tx, cfg, CANVAS, n_old_classes=N_OLD,
        share_frozen_prefix=False)
    batch = Batch(
        pixels=jnp.asarray(images),
        sizes=jnp.tile(jnp.asarray([list(CANVAS)], jnp.int32), (2, 1)),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_mask=jnp.asarray(gt_mask),
    )
    new_state, metrics = step(state, params_t, batch)
    metrics = {k: float(v) for k, v in metrics.items()}
    new_params = jax.device_get(new_state.params)

    # ---- torch oracle
    t_student = TorchRefFPN(STAGES, WPG, RES2, FPN_OUT, len(RATIOS),
                            C_STUDENT, REP)
    t_teacher = TorchRefFPN(STAGES, WPG, RES2, FPN_OUT, len(RATIOS),
                            C_TEACHER, REP).eval()
    copy_flax_fpn_params_to_torch(params_s, t_student)
    copy_flax_fpn_params_to_torch(params_t, t_teacher)

    oracle = _torch_fpn_incremental_step(
        t_student, t_teacher, images, gt_boxes, gt_labels, gt_mask)
    return cfg, metrics, new_params, params_s, t_student, oracle


def _select_merged(outs, anchors_l, pre, post, fpn_post, image_idx,
                   detach=False):
    """Per-level selection + cross-level top-N (rpn/inference.py:120-176)
    for one image, from torch per-level outputs."""
    lvl_boxes, lvl_scores = [], []
    for (ot, rt), anchors in zip(outs, anchors_l):
        o, r = _flatten_level(ot.detach() if detach else ot,
                              rt.detach() if detach else rt)
        bx, sc = select_proposals_np(
            o[image_idx].numpy(), r[image_idx].numpy(), anchors, CANVAS,
            pre, post)
        lvl_boxes.append(bx)
        lvl_scores.append(sc)
    boxes = np.concatenate(lvl_boxes)
    scores = np.concatenate(lvl_scores)
    order = np.argsort(-scores, kind="stable")[:fpn_post]
    return boxes[order], scores[order]


def _torch_fpn_incremental_step(t_student, t_teacher, images,
                                gt_boxes, gt_labels, gt_mask):
    b = images.shape[0]
    imgs_t = torch.from_numpy(images.transpose(0, 3, 1, 2))

    # per-level anchors in the engine's (h, w, a) order
    with torch.no_grad():
        pyr_probe = t_teacher.fpn(t_teacher.backbone(imgs_t))
    anchors_l = [
        grid_anchors(p.shape[2], p.shape[3], stride, (size,), RATIOS)
        for p, stride, size in zip(pyr_probe, FPN_STRIDES, ANCHOR_SIZES)
    ]
    anchors = np.concatenate(anchors_l, axis=0)

    # ---- teacher soften proposals over the merged levels
    with torch.no_grad():
        pyr_t = t_teacher.fpn(t_teacher.backbone(imgs_t))
        outs_t = t_teacher.rpn(pyr_t)
    pyr_t_np = [p.numpy().transpose(0, 2, 3, 1) for p in pyr_t]
    teacher_props, teacher_soften = [], []
    for i in range(b):
        boxes, _ = _select_merged(outs_t, anchors_l, PRE_NMS, POST_NMS,
                                  FPN_POST_TEST, i)
        boxes = boxes[:SOFTEN]
        assert len(boxes) == SOFTEN, "take-all regime needs a full buffer"
        pooled = fpn_roi_align_np([p[i] for p in pyr_t_np[:4]], boxes)
        with torch.no_grad():
            s_cls, s_reg = t_teacher.box_head(
                torch.from_numpy(pooled.transpose(0, 3, 1, 2).copy()))
        teacher_props.append(boxes)
        teacher_soften.append((s_cls, s_reg.reshape(-1, C_TEACHER, 4), pooled))

    # ---- student forward
    feats_s = t_student.backbone(imgs_t)
    pyr_s = t_student.fpn(feats_s)
    outs_s = t_student.rpn(pyr_s)
    obj_f = torch.cat([_flatten_level(o, r)[0] for o, r in outs_s], dim=1)
    reg_f = torch.cat([_flatten_level(o, r)[1] for o, r in outs_s], dim=1)

    # ---- RPN losses over the concatenated anchors (take-all)
    vis = anchor_visibility_np(anchors, *CANVAS)
    obj_terms, box_terms, n_sampled = [], [], 0
    for i in range(b):
        gtb = gt_boxes[i][gt_mask[i]]
        quality = iou_np(gtb, anchors)
        m = match_np(quality, 0.7, 0.3, allow_low_quality=True)
        labels = np.where(m >= 0, 1.0, 0.0)
        labels[m == BELOW] = 0.0
        labels[~vis] = -1.0
        labels[m == BETWEEN] = -1.0
        sampled = labels >= 0
        n_sampled += int(sampled.sum())
        tgt = torch.from_numpy(labels[sampled].astype(np.float32))
        obj_terms.append(torch.nn.functional.binary_cross_entropy_with_logits(
            obj_f[i][torch.from_numpy(sampled)], tgt, reduction="sum"))
        pos = labels == 1.0
        reg_t = encode_np(gtb[m[pos]], anchors[pos], (1.0, 1.0, 1.0, 1.0))
        box_terms.append(smooth_l1_t(
            reg_f[i][torch.from_numpy(pos)] - torch.from_numpy(reg_t),
            beta=1.0 / 9).sum())
    loss_objectness = sum(obj_terms) / n_sampled
    loss_rpn_box = sum(box_terms) / n_sampled

    # ---- box-head losses on train proposals + gt, take-all
    pyr_s_hwc = [p.permute(0, 2, 3, 1) for p in pyr_s]
    cls_terms, box_reg_terms, n_rois, pos_counts = [], [], 0, []
    id_cls_terms, id_bbox_terms, afd_terms, pad_terms, n_soften = \
        [], [], [], [], 0
    for i in range(b):
        boxes, _ = _select_merged(outs_s, anchors_l, PRE_NMS, POST_NMS,
                                  FPN_POST_TRAIN, i, detach=True)
        gtb = gt_boxes[i][gt_mask[i]]
        props = np.concatenate([boxes, gtb], axis=0)
        quality = iou_np(gtb, props)
        m = match_np(quality, 0.5, 0.5, allow_low_quality=False)
        labels = gt_labels[i][gt_mask[i]][m.clip(0)].astype(np.int64)
        labels[m == BELOW] = 0
        labels[m == BETWEEN] = -1
        assert (labels >= 0).all()
        reg_targets = encode_np(gtb[m.clip(0)], props, (10.0, 10.0, 5.0, 5.0))
        n_rois += len(props)
        pos = labels > 0
        pos_counts.append(int(pos.sum()))

        pooled = _fpn_pool_torch(pyr_s_hwc, i, props)
        logits, breg = t_student.box_head(pooled.permute(0, 3, 1, 2))
        cls_terms.append(inclusive_ce_torch(
            logits, torch.from_numpy(labels), N_OLD).sum())
        per_class = breg.reshape(-1, C_STUDENT, 4)[
            torch.arange(len(props)), torch.from_numpy(labels.clip(0))]
        box_l = smooth_l1_t(
            per_class - torch.from_numpy(reg_targets), beta=1.0).sum(-1)
        box_reg_terms.append(box_l[torch.from_numpy(pos)].sum())

        # ---- 'id' + ARD distillation on the teacher's merged proposals
        tb = teacher_props[i]
        s_cls, s_reg, t_pool_np = teacher_soften[i]
        n_soften += len(tb)
        st_pool = _fpn_pool_torch(pyr_s_hwc, i, tb)
        t_cls, t_reg = t_student.box_head(st_pool.permute(0, 3, 1, 2))
        cls_term, bbox_term = id_distillation_torch(
            s_cls, s_reg, t_cls, t_reg.reshape(-1, C_STUDENT, 4))
        id_cls_terms.append(cls_term.sum())
        id_bbox_terms.append(bbox_term.sum())
        afd, pad = ard_torch(st_pool, torch.from_numpy(t_pool_np), GAMMA)
        afd_terms.append(afd.sum())
        pad_terms.append(pad.sum())

    assert all(p <= ROI_BATCH // 4 for p in pos_counts), pos_counts
    loss_classifier = sum(cls_terms) / n_rois
    loss_box_reg = sum(box_reg_terms) / n_rois

    # ---- per-level RPN distillation (reference distillation.py:18-83
    # looped over the level lists)
    rpn_dist = torch.zeros(())
    for (so, sr), (to, tr) in zip(outs_s, outs_t):
        so_n = so.permute(0, 2, 3, 1)
        to_n = to.permute(0, 2, 3, 1)
        a = so_n.shape[-1]
        sr_n = sr.permute(0, 2, 3, 1).reshape(b, -1, a, 4).reshape(b, -1, 4)
        tr_n = tr.permute(0, 2, 3, 1).reshape(b, -1, a, 4).reshape(b, -1, 4)
        diff = to_n - so_n
        cls_l = (torch.clamp(diff, min=0.0) ** 2).mean()
        mask = (diff.reshape(b, -1, 1) > 0.1).float()
        l2 = ((tr_n * mask - sr_n * mask) ** 2).sum(-1)
        rpn_dist = rpn_dist + cls_l + l2.mean()

    distill = (
        ALPHA * (sum(id_cls_terms) + sum(id_bbox_terms)) / n_soften
        + BETA * (sum(afd_terms) + sum(pad_terms)) / n_soften
        + rpn_dist
    )
    frcnn = loss_objectness + loss_rpn_box + loss_classifier + loss_box_reg
    total = frcnn + distill

    opt = make_reference_sgd(
        t_student, ("stem_conv", "stages.0."), LR, MOMENTUM, WD, BIAS_LR,
        WD_BIAS)
    opt.zero_grad()
    total.backward()
    opt.step()
    return {
        "loss_objectness": float(loss_objectness.detach()),
        "loss_rpn_box_reg": float(loss_rpn_box.detach()),
        "loss_classifier": float(loss_classifier.detach()),
        "loss_box_reg": float(loss_box_reg.detach()),
        "distillation_loss": float(distill.detach()),
        "faster_rcnn_loss": float(frcnn.detach()),
        "loss": float(total.detach()),
    }


def _fpn_pool_torch(pyr_hwc, image_idx, rois_np):
    """Multi-level pool through torch (differentiable) mirroring
    fpn_roi_align: per-RoI level assignment + per-level RoIAlign."""
    from tests.torch_ref_fpn import fpn_level_np
    from tests.torch_ref_train import roi_align_torch

    lvl = fpn_level_np(np.asarray(rois_np, np.float32))
    pools = []
    scales = tuple(1.0 / s for s in FPN_STRIDES[:4])
    for j, roi in enumerate(rois_np):
        l = int(lvl[j])
        pools.append(roi_align_torch(
            pyr_hwc[l][image_idx], np.asarray(roi[None], np.float32), 7,
            scales[l], 2)[0])
    return torch.stack(pools)


def test_fpn_all_loss_terms_match(parity):
    _, metrics, _, _, _, oracle = parity
    for k, want in oracle.items():
        assert np.isfinite(want), (k, want)
        np.testing.assert_allclose(
            metrics[k], want, rtol=2e-3, atol=1e-5, err_msg=k)


def test_fpn_post_sgd_parameter_deltas_match(parity):
    cfg, _, new_params, params_s, t_student, _ = parity
    t_from_jax = TorchRefFPN(STAGES, WPG, RES2, FPN_OUT, len(RATIOS),
                             C_STUDENT, REP)
    copy_flax_fpn_params_to_torch(new_params, t_from_jax)
    t_old = TorchRefFPN(STAGES, WPG, RES2, FPN_OUT, len(RATIOS),
                        C_STUDENT, REP)
    copy_flax_fpn_params_to_torch(params_s, t_old)

    sd_jax = dict(t_from_jax.state_dict())
    sd_ref = dict(t_student.state_dict())
    sd_old = dict(t_old.state_dict())
    assert sd_jax.keys() == sd_ref.keys()
    moved = 0
    for k in sd_ref:
        d_jax = sd_jax[k].numpy() - sd_old[k].numpy()
        d_ref = sd_ref[k].numpy() - sd_old[k].numpy()
        scale = np.abs(d_ref).max()
        if scale == 0:
            np.testing.assert_array_equal(d_jax, 0, err_msg=k)
            continue
        moved += 1
        np.testing.assert_allclose(
            d_jax, d_ref, rtol=0, atol=2e-2 * scale + 1e-9, err_msg=k)
    assert moved > 15  # sanity: real updates were compared
