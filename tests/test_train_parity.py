"""Full incremental TRAIN-STEP parity vs an independent torch oracle.

The last seam between "each loss matches a torch oracle" and "the step
trains the same model" (round-2 verdict, item 1): ONE complete ABR
incremental iteration — teacher soften proposals, RPN matching +
targets, proposal selection + gt append, RoI matching + sampling, all
Faster R-CNN losses with the Inclusive Classification Loss, the 'id' +
ARD distillation, and the SGD update — runs through our fused jit step
AND through a torch/numpy re-statement of the reference loop
(tools/train_incremental.py:55-147 + modeling/roi_heads/box_head/
loss.py:86-179 + distillation/distillation.py), asserting every loss
term AND the post-SGD parameter deltas agree.

RNG is sidestepped the way the verdict prescribes: sampling quotas are
configured >= candidate counts (RPN batch 256 > 240 anchors; RoI batch
64 > 32 post-NMS + gt; SOFTEN_KEEP == SOFTEN_TOPK), so every "random
subsample" deterministically takes ALL candidates on both sides and the
losses/gradients are order-invariant sums over identical sets.  A drift
in matcher, encode, visibility, loss normalization, distillation
formula, LR grouping, weight decay, or momentum fails this test.
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
from abr_iod_tpu.models.build import build_detection_model
from abr_iod_tpu.solver.optim import make_optimizer
from tests.oracles import roi_align_numpy
from tests.test_full_model_parity import _randomize
from tests.torch_ref_model import (
    TorchRefC4, copy_flax_params_to_torch, select_proposals_np,
)
from tests.torch_ref_train import (
    BELOW, BETWEEN, anchor_visibility_np, ard_torch, encode_np,
    id_distillation_torch, inclusive_ce_torch, iou_np, make_reference_sgd,
    match_np, roi_align_torch, smooth_l1_t,
)

pytestmark = pytest.mark.slow  # compile-heavy tier

CANVAS = (128, 160)
STAGES, WPG, RES2 = (1, 1, 1), 8, 16
N_OLD = 2
C_TEACHER, C_STUDENT = N_OLD + 1, N_OLD + 3  # bg+2 old | bg+2 old+2 new
ANCHOR_SIZES, RATIOS = (16, 32, 64), (1.0,)
PRE_NMS, POST_NMS, SOFTEN = 128, 32, 16
ROI_BATCH = 64  # > POST_NMS + MAX_GT -> deterministic take-all sampling
LR, MOMENTUM, WD, BIAS_LR, WD_BIAS = 0.02, 0.9, 1e-4, 2.0, 0.0
ALPHA, BETA, GAMMA = 0.5, 1.0, 1.0


def _cfg():
    cfg = get_default_config()
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = C_STUDENT
    cfg.MODEL.RPN.ANCHOR_SIZES = ANCHOR_SIZES
    cfg.MODEL.RPN.ASPECT_RATIOS = RATIOS
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = PRE_NMS
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = ROI_BATCH
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = WPG
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = RES2
    cfg.DIST.TYPE = "id"
    cfg.DIST.FEAT = "ard"
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
    cfg.TPU.MAX_GT = 8
    cfg.TPU.BACKBONE_STAGES = STAGES
    cfg.TPU.RES5_BLOCKS = 1
    cfg.TPU.RES5_BOTTLENECK = 16
    cfg.TPU.RES5_OUT = 32
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
        [(12, 16, 66, 70, 3), (70, 40, 140, 100, 4), (30, 80, 90, 120, 3)],
        [(40, 10, 120, 66, 4), (8, 60, 56, 118, 3)],
    ]
    for i, items in enumerate(raw):
        for j, (x1, y1, x2, y2, c) in enumerate(items):
            gt_boxes[i, j] = [x1, y1, x2, y2]
            gt_labels[i, j] = c
            gt_mask[i, j] = True
    return gt_boxes, gt_labels, gt_mask


@pytest.fixture(scope="module")
def parity():
    cfg = _cfg()
    cfg_teacher = cfg.clone()
    cfg_teacher.MODEL.ROI_BOX_HEAD.NUM_CLASSES = C_TEACHER

    model_s = build_detection_model(cfg)
    model_t = build_detection_model(cfg_teacher)
    px0 = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    rois0 = jnp.zeros((1, 4, 4)) + 16.0
    params_s = _randomize(
        jax.jit(model_s.init)(jax.random.PRNGKey(0), px0, rois0), seed=7)
    params_t = _randomize(
        jax.jit(model_t.init)(jax.random.PRNGKey(1), px0, rois0), seed=5)

    rng = np.random.RandomState(3)
    images = rng.uniform(-100, 100, (2, *CANVAS, 3)).astype(np.float32)
    gt_boxes, gt_labels, gt_mask = _gts()

    # ---- our fused jit step: 1 iteration, capture losses + new params
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

    # ---- torch oracle of the same iteration
    t_student = TorchRefC4(STAGES, WPG, RES2, 3, C_STUDENT, 1, 16, 32)
    t_teacher = TorchRefC4(STAGES, WPG, RES2, 3, C_TEACHER, 1, 16, 32).eval()
    copy_flax_params_to_torch(params_s, t_student)
    copy_flax_params_to_torch(params_t, t_teacher)

    anchors = grid_anchors(CANVAS[0] // 16, CANVAS[1] // 16, 16,
                           ANCHOR_SIZES, RATIOS)
    oracle = _torch_incremental_step(
        t_student, t_teacher, images, np.asarray(anchors),
        gt_boxes, gt_labels, gt_mask)

    return cfg, metrics, new_params, params_s, t_student, oracle


def _flatten_rpn(obj, reg):
    """[B,A,H,W]/[B,4A,H,W] -> [B,HWA]/[B,HWA,4] in the reference's
    permute_and_flatten anchor order (rpn/utils.py)."""
    b, a, h, w = obj.shape
    obj_f = obj.permute(0, 2, 3, 1).reshape(b, -1)
    reg_f = reg.permute(0, 2, 3, 1).reshape(b, h * w, a, 4).reshape(b, -1, 4)
    return obj_f, reg_f


def _torch_incremental_step(t_student, t_teacher, images, anchors,
                            gt_boxes, gt_labels, gt_mask):
    """One reference iteration (tools/train_incremental.py:55-147) in torch."""
    b = images.shape[0]
    imgs_t = torch.from_numpy(images.transpose(0, 3, 1, 2))

    # teacher soften proposals (generalized_rcnn.py:121-167); KEEP == TOPK
    # so the random.sample subset is the whole set
    with torch.no_grad():
        c4_teacher = t_teacher.backbone(imgs_t)
        obj_T, reg_T = t_teacher.rpn(c4_teacher)
    obj_Tf, reg_Tf = _flatten_rpn(obj_T, reg_T)
    c4_teacher_np = c4_teacher.numpy().transpose(0, 2, 3, 1)
    teacher_props, teacher_soften = [], []
    for i in range(b):
        boxes, _ = select_proposals_np(
            obj_Tf[i].numpy(), reg_Tf[i].numpy(), anchors, CANVAS,
            PRE_NMS, SOFTEN)
        pooled = roi_align_numpy(c4_teacher_np[i], boxes, 7, 1.0 / 16, 2)
        with torch.no_grad():
            s_cls, s_reg = t_teacher.box_head(
                torch.from_numpy(pooled.transpose(0, 3, 1, 2).copy()))
        teacher_props.append(boxes)
        teacher_soften.append(
            (s_cls, s_reg.reshape(-1, C_TEACHER, 4), pooled))

    # student forward
    c4 = t_student.backbone(imgs_t)
    obj, reg = t_student.rpn(c4)
    obj_f, reg_f = _flatten_rpn(obj, reg)
    c4_hwc = c4.permute(0, 2, 3, 1)

    # ---- RPN losses (rpn/loss.py:104-148), take-all sampling
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

    # ---- proposals (detached) + gt append, RoI matching, take-all sample
    cls_terms, box_reg_terms, n_rois = [], [], 0
    pos_counts = []
    id_cls_terms, id_bbox_terms, afd_terms, pad_terms, n_soften = [], [], [], [], 0
    for i in range(b):
        boxes, _ = select_proposals_np(
            obj_f[i].detach().numpy(), reg_f[i].detach().numpy(), anchors,
            CANVAS, PRE_NMS, POST_NMS)
        gtb = gt_boxes[i][gt_mask[i]]
        props = np.concatenate([boxes, gtb], axis=0)
        quality = iou_np(gtb, props)
        m = match_np(quality, 0.5, 0.5, allow_low_quality=False)
        labels = gt_labels[i][gt_mask[i]][m.clip(0)].astype(np.int64)
        labels[m == BELOW] = 0
        labels[m == BETWEEN] = -1
        assert (labels >= 0).all()  # equal thresholds: no BETWEEN band
        reg_targets = encode_np(gtb[m.clip(0)], props, (10.0, 10.0, 5.0, 5.0))
        n_rois += len(props)
        pos = labels > 0
        pos_counts.append(int(pos.sum()))

        pooled = roi_align_torch(c4_hwc[i], props, 7, 1.0 / 16, 2)
        logits, breg = t_student.box_head(pooled.permute(0, 3, 1, 2))
        cls_terms.append(inclusive_ce_torch(
            logits, torch.from_numpy(labels), N_OLD).sum())
        per_class = breg.reshape(-1, C_STUDENT, 4)[
            torch.arange(len(props)), torch.from_numpy(labels.clip(0))]
        box_l = smooth_l1_t(
            per_class - torch.from_numpy(reg_targets), beta=1.0).sum(-1)
        box_reg_terms.append(box_l[torch.from_numpy(pos)].sum())

        # ---- distillation on the teacher's proposals (rescored by student)
        tb = teacher_props[i]
        s_cls, s_reg, t_pool_np = teacher_soften[i]
        n_soften += len(tb)
        st_pool = roi_align_torch(c4_hwc[i], tb, 7, 1.0 / 16, 2)
        t_cls, t_reg = t_student.box_head(st_pool.permute(0, 3, 1, 2))
        cls_term, bbox_term = id_distillation_torch(
            s_cls, s_reg, t_cls, t_reg.reshape(-1, C_STUDENT, 4))
        id_cls_terms.append(cls_term.sum())
        id_bbox_terms.append(bbox_term.sum())
        afd, pad = ard_torch(st_pool, torch.from_numpy(t_pool_np), GAMMA)
        afd_terms.append(afd.sum())
        pad_terms.append(pad.sum())

    # the take-all regime requires positives under the 25% quota
    assert all(p <= ROI_BATCH // 4 for p in pos_counts), pos_counts

    loss_classifier = sum(cls_terms) / n_rois
    loss_box_reg = sum(box_reg_terms) / n_rois
    distill = (
        ALPHA * (sum(id_cls_terms) + sum(id_bbox_terms)) / n_soften
        + BETA * (sum(afd_terms) + sum(pad_terms)) / n_soften
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


def test_all_loss_terms_match(parity):
    _, metrics, _, _, _, oracle = parity
    for k, want in oracle.items():
        assert np.isfinite(want), (k, want)
        np.testing.assert_allclose(
            metrics[k], want, rtol=2e-3, atol=1e-5, err_msg=k)


def test_post_sgd_parameter_deltas_match(parity):
    """The updated parameters after one SGD step agree leaf-by-leaf —
    pins gradients, LR grouping (bias x2), weight decay, momentum-step
    semantics, and the frozen-prefix masks, all at once."""
    cfg, _, new_params, params_s, t_student, _ = parity

    # map old and updated jax trees onto torch models, then compare the
    # per-tensor UPDATE (new - old) against the torch-side update — far
    # tighter than comparing absolute weights, since the update is the
    # quantity the optimizer path actually produces
    t_from_jax = TorchRefC4(STAGES, WPG, RES2, 3, C_STUDENT, 1, 16, 32)
    copy_flax_params_to_torch(new_params, t_from_jax)
    t_old = TorchRefC4(STAGES, WPG, RES2, 3, C_STUDENT, 1, 16, 32)
    copy_flax_params_to_torch(params_s, t_old)

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
            # frozen prefix / FrozenBN buffers: our side must also be frozen
            np.testing.assert_array_equal(d_jax, 0, err_msg=k)
            continue
        moved += 1
        np.testing.assert_allclose(
            d_jax, d_ref, rtol=0, atol=2e-2 * scale + 1e-9, err_msg=k)
    assert moved > 10  # sanity: real updates were compared


def test_frozen_prefix_received_no_update(parity):
    """stem + layer1 are frozen on both sides (FREEZE_CONV_BODY_AT=2):
    the jax step must leave them bit-identical."""
    cfg, _, new_params, _, _, _ = parity
    model_s = build_detection_model(_cfg())
    px0 = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    params0 = _randomize(
        jax.jit(model_s.init)(jax.random.PRNGKey(0), px0,
                              jnp.zeros((1, 4, 4)) + 16.0), seed=7)
    for name in ("stem", "layer1"):
        got = jax.tree_util.tree_leaves(new_params["params"]["backbone"][name])
        want = jax.tree_util.tree_leaves(params0["params"]["backbone"][name])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
