"""Incremental (teacher/student) training step — the ABR core loop.

Reference: tools/train_incremental.py:55-147.  Per iteration the
reference runs, in one process: (a) the frozen teacher's
``generate_soften_proposal`` (generalized_rcnn.py:121-167: RPN → sort by
objectness → top-128 → random-keep 64 → RoI soft labels), (b) the
student's standard Faster R-CNN forward with the Inclusive
Classification Loss, (c) a second student forward re-scoring the
teacher's proposals (generalized_rcnn.py:66-68), and (d) the
distillation losses (inclusive 'id' + ARD + optional RPN/feature).

TPU-native shape: ALL of (a)-(d) plus the SGD update compile into ONE
jit program on the data mesh; the teacher's frozen params are a second
pytree resident on the same devices (no second process, no NCCL).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..distillation import losses as D
from ..models.anchors import anchors_for_shape
from ..models.proposals import (
    select_proposals, effective_top_n, effective_approx_recall,
)
from ..models.rpn import flatten_rpn_outputs
from .train import Batch, TrainState, forward_detection_losses


class SoftenResult(NamedTuple):
    boxes: jnp.ndarray  # [B, K, 4] teacher-selected proposals
    valid: jnp.ndarray  # [B, K]
    scores: jnp.ndarray  # [B, K, C_old] raw logits
    bboxes: jnp.ndarray  # [B, K, C_old, 4]
    roi_features: jnp.ndarray  # [B, K, P, P, C]
    features: jnp.ndarray  # [B, H, W, C] backbone C4 map
    backbone_features: tuple
    rpn_objectness: jnp.ndarray  # [B, h, w, A]
    rpn_box_deltas: jnp.ndarray  # [B, h, w, 4A]


def generate_soften_proposals(model, params, pixels, sizes, key, cfg, anchors) -> SoftenResult:
    """Teacher API (reference generalized_rcnn.py:121-167)."""
    topk = int(cfg.TPU.SOFTEN_TOPK)
    keep = int(cfg.TPU.SOFTEN_KEEP)

    features, backbone_feats = model.apply(params, pixels, method="backbone")
    objectness, box_deltas = model.apply(params, features, method="rpn")
    obj_f, reg_f = flatten_rpn_outputs(objectness, box_deltas)

    # our NMS emits proposals in descending objectness order, so "sort by
    # objectness then take top-128" is NMS with max_output=128
    props = select_proposals(
        obj_f, reg_f, anchors, sizes,
        pre_nms_top_n=effective_top_n(cfg, train=False)[0],
        post_nms_top_n=topk,
        nms_thresh=float(cfg.MODEL.RPN.NMS_THRESH),
        min_size=float(cfg.MODEL.RPN.MIN_SIZE),
        approx_recall=effective_approx_recall(cfg),
    )

    # random-keep `keep` of the top-`topk` WITHOUT replacement
    # (generalized_rcnn.py:141-155 uses random.sample over however many
    # proposals exist, :147-151).  NMS emits valid slots first; rank valid
    # slots by random keys so the first `keep` picks are a uniform
    # without-replacement sample of the valid prefix.  When fewer than
    # `keep` survive, the tail picks land on invalid slots and carry
    # valid=False — downstream distillation masks them out rather than
    # duplicating proposals (which would over-weight them vs the reference).
    bsz = pixels.shape[0]
    n_valid = jnp.sum(props.valid.astype(jnp.int32), axis=1)  # [B]

    def pick(k, nv_i):
        r = jax.random.uniform(k, (topk,))
        r = jnp.where(jnp.arange(topk) < nv_i, r, 2.0)  # invalid slots last
        return jnp.argsort(r)[:keep]

    sel = jax.vmap(pick)(jax.random.split(key, bsz), n_valid)  # [B, keep]
    boxes = jnp.take_along_axis(props.boxes, sel[..., None], axis=1)
    valid = jnp.take_along_axis(props.valid, sel, axis=1)

    cls_logits, box_reg, roi_feats, _ = model.apply(
        params, features, boxes, method="roi_heads"
    )
    c_old = cls_logits.shape[-1]
    return SoftenResult(
        boxes=boxes,
        valid=valid,
        scores=cls_logits,
        bboxes=box_reg.reshape(bsz, keep, c_old, 4),
        roi_features=roi_feats,
        features=features,
        backbone_features=tuple(backbone_feats),
        rpn_objectness=objectness,
        rpn_box_deltas=box_deltas,
    )


def generate_soften_proposals_fpn(model, params, pixels, sizes, key,
                                  cfg) -> SoftenResult:
    """Teacher API for an FPN backbone: per-level selection + cross-level
    merge (the reference machinery is backbone-generic,
    generalized_rcnn.py:121-167 + rpn/inference.py:149-176)."""
    from .fpn import _select_fpn_proposals, fpn_level_anchors

    topk = int(cfg.TPU.SOFTEN_TOPK)
    keep = int(cfg.TPU.SOFTEN_KEEP)

    pyramid, backbone_feats = model.apply(params, pixels, method="backbone")
    rpn_outs = model.apply(params, pyramid, method="rpn")
    anchors_l = fpn_level_anchors(cfg, [p.shape for p in pyramid])
    pb, ps, pv = _select_fpn_proposals(rpn_outs, anchors_l, sizes, cfg, False)
    # cross-level merge is objectness-sorted desc (top_k), so the first
    # `topk` slots ARE the reference's sort-then-top-128; valid first.
    # The merged buffer can be narrower than SOFTEN_TOPK (small
    # FPN_POST_NMS_TOP_N) — clamp instead of letting take_along_axis
    # silently duplicate the last slot
    eff_topk = min(topk, pb.shape[1])
    if keep > eff_topk:
        raise ValueError(
            f"TPU.SOFTEN_KEEP={keep} exceeds the {eff_topk} available "
            "merged FPN proposals (raise FPN_POST_NMS_TOP_N or lower "
            "SOFTEN_KEEP)"
        )
    boxes_t, valid_t = pb[:, :eff_topk], pv[:, :eff_topk]

    bsz = pixels.shape[0]
    n_valid = jnp.sum(valid_t.astype(jnp.int32), axis=1)

    def pick(k, nv_i):
        r = jax.random.uniform(k, (eff_topk,))
        r = jnp.where(jnp.arange(eff_topk) < nv_i, r, 2.0)
        return jnp.argsort(r)[:keep]

    sel = jax.vmap(pick)(jax.random.split(key, bsz), n_valid)
    boxes = jnp.take_along_axis(boxes_t, sel[..., None], axis=1)
    valid = jnp.take_along_axis(valid_t, sel, axis=1)

    cls_logits, box_reg, roi_feats, _ = model.apply(
        params, pyramid, boxes, method="roi_heads"
    )
    c_old = cls_logits.shape[-1]
    return SoftenResult(
        boxes=boxes,
        valid=valid,
        scores=cls_logits,
        bboxes=box_reg.reshape(bsz, keep, c_old, 4),
        roi_features=roi_feats,
        features=tuple(pyramid),
        backbone_features=tuple(backbone_feats),
        rpn_objectness=tuple(o for o, _ in rpn_outs),
        rpn_box_deltas=tuple(r for _, r in rpn_outs),
    )


def incremental_losses(model, params, teacher: SoftenResult, batch: Batch, key,
                       cfg, anchors, n_old_classes: int):
    """Student losses + distillation for one batch."""
    dist_type = str(cfg.DIST.TYPE)
    is_fpn = getattr(model, "is_fpn", False)
    if is_fpn:
        from .fpn import fpn_forward_detection_losses

        frcnn_total, metrics, aux = fpn_forward_detection_losses(
            model, params, batch, key, cfg,
            dist_type=dist_type, n_old_classes=n_old_classes,
        )
        student_feats = aux["pyramid"]
    else:
        frcnn_total, metrics, aux = forward_detection_losses(
            model, params, batch, key, cfg, anchors,
            dist_type=dist_type, n_old_classes=n_old_classes,
        )
        student_feats = aux["features"]

    # student re-scores the teacher's proposals in a SEPARATE box-head
    # pass (generalized_rcnn.py:66-68).  Fusing it into the sampled-RoI
    # pass (one 576-RoI res5 call via extra_rois) measured 36.1 vs 44.5
    # img/s/chip — 576 breaks the MXU-friendly 512 tiling and XLA
    # pipelines the small second pass better (BASELINE.md round-2 notes).
    t_cls, t_reg, roi_feats_student, _ = model.apply(
        params, student_feats, teacher.boxes, method="roi_heads"
    )
    bsz, keep = teacher.boxes.shape[:2]
    c_new = t_cls.shape[-1]
    prop_valid = teacher.valid.reshape(bsz * keep)

    distill = jnp.zeros((), jnp.float32)
    alpha = float(cfg.DIST.ALPHA)
    if alpha > 0 and dist_type in ("id", "l2"):
        distill = distill + alpha * D.roi_distillation_losses(
            teacher.scores.reshape(bsz * keep, -1),
            teacher.bboxes.reshape(bsz * keep, -1, 4),
            t_cls.reshape(bsz * keep, c_new),
            t_reg.reshape(bsz * keep, c_new, 4),
            dist=dist_type,
            weights=prop_valid,
        )

    feat_mode = cfg.DIST.FEAT
    if feat_mode == "std":
        if is_fpn:
            distill = distill + D.feature_distillation_loss(
                list(teacher.features), list(student_feats)
            )
        else:
            distill = distill + D.feature_distillation_loss(
                [teacher.features], [student_feats]
            )
    elif feat_mode == "ard":
        p = teacher.roi_features.shape[2]
        c = teacher.roi_features.shape[-1]
        distill = distill + float(cfg.DIST.BETA) * D.attentive_roi_distillation_loss(
            roi_feats_student.reshape(bsz * keep, p, p, c),
            teacher.roi_features.reshape(bsz * keep, p, p, c),
            gamma=float(cfg.DIST.GAMMA),
            weights=prop_valid,
        )

    if bool(cfg.DIST.RPN):
        if is_fpn:
            # the reference loops over the per-level RPN output lists
            # (distillation.py:21-30); sum levels
            for (so, sr), to, tr in zip(
                aux["rpn_outs"], teacher.rpn_objectness, teacher.rpn_box_deltas
            ):
                distill = distill + D.rpn_distillation_loss(
                    to, tr, so, sr, bbox_threshold=0.1
                )
        else:
            distill = distill + D.rpn_distillation_loss(
                teacher.rpn_objectness,
                teacher.rpn_box_deltas,
                aux["rpn_objectness"],
                aux["rpn_box_deltas"],
                bbox_threshold=0.1,
            )

    total = frcnn_total + distill
    metrics = dict(metrics)
    metrics["distillation_loss"] = distill
    metrics["faster_rcnn_loss"] = frcnn_total
    metrics["loss"] = total
    return total, metrics


def frozen_prefix_child_names(cfg) -> tuple:
    """Backbone children frozen in BOTH teacher and student: stem + layers
    below FREEZE_CONV_BODY_AT (reference resnet.py:134-143), or every
    stage under BACKBONE.FREEZE."""
    freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
    if bool(cfg.MODEL.BACKBONE.get("FREEZE", False)) or bool(
        cfg.MODEL.BACKBONE.get("ALL_FREEZE", False)
    ):
        n_stages = len(tuple(cfg.TPU.BACKBONE_STAGES))
        return ("stem",) + tuple(f"layer{s}" for s in range(1, n_stages + 1))
    names = [] if freeze_at < 1 else ["stem"]
    names += [f"layer{s}" for s in range(1, freeze_at)]
    return tuple(names)


def prefix_params_equal(student_params, teacher_params, cfg) -> bool:
    """Host-side gate for the shared-frozen-prefix optimization: True iff
    the student's frozen backbone prefix is value-identical to the
    teacher's (guaranteed by checkpoint chaining — the student is
    initialized from the teacher and the prefix receives zero updates —
    but verified rather than assumed)."""
    import numpy as np

    names = frozen_prefix_child_names(cfg)
    if not names:
        return False
    try:
        sb = student_params["params"]["backbone"]
        tb = teacher_params["params"]["backbone"]
    except (KeyError, TypeError):
        return False
    for n in names:
        if n not in sb or n not in tb:
            return False
        sl = jax.tree_util.tree_leaves(sb[n])
        tl = jax.tree_util.tree_leaves(tb[n])
        if len(sl) != len(tl):
            return False
        for a, b in zip(sl, tl):
            a, b = np.asarray(a), np.asarray(b)
            if a.shape != b.shape or not np.array_equal(a, b):
                return False
    return True


def _substitute_prefix(student_params, teacher_params, names):
    """Alias the student's frozen backbone prefix to the teacher's leaves
    (value-identical by the prefix_params_equal gate).  Inside the fused
    jit program both forwards then read the SAME parameter instructions,
    so XLA's CSE merges the duplicated stem/layer computation — the
    teacher and student no longer each pay for the frozen prefix."""
    col = dict(student_params["params"])
    bb = dict(col["backbone"])
    for n in names:
        bb[n] = teacher_params["params"]["backbone"][n]
    col["backbone"] = bb
    out = dict(student_params)
    out["params"] = col
    return type(student_params)(out) if not isinstance(student_params, dict) else out


def make_incremental_train_step(model_teacher, model_student, tx, cfg, canvas_hw,
                                n_old_classes: int, stride: int = 16,
                                share_frozen_prefix: bool = False):
    """Build the fused teacher+student jit step.

    Returns step(state, teacher_params, batch) → (state, metrics).

    share_frozen_prefix: caller asserts (via prefix_params_equal) that the
    student's frozen backbone prefix equals the teacher's; the step then
    computes that prefix once for both models.  Gradients for the prefix
    are structural zeros either way (stop_gradient in ResNetC4).
    """
    is_fpn = getattr(model_student, "is_fpn", False)
    if is_fpn != getattr(model_teacher, "is_fpn", False):
        raise ValueError(
            "teacher and student must share a backbone family for the "
            "incremental step (the reference chains checkpoints of one "
            "architecture, tools/train_incremental.py:184-249)"
        )
    # the frozen-prefix CSE optimization targets the C4 ResNet layout;
    # FPN runs without it (its prefix naming differs)
    prefix_names = (
        frozen_prefix_child_names(cfg)
        if share_frozen_prefix and not is_fpn else ()
    )

    def loss_fn(params, teacher_params, teacher, batch, key):
        anchors = None if is_fpn else anchors_for_shape(
            cfg, batch.pixels.shape[1], batch.pixels.shape[2], stride
        )
        if prefix_names:
            params = _substitute_prefix(params, teacher_params, prefix_names)
        return incremental_losses(
            model_student, params, teacher, batch, key, cfg, anchors, n_old_classes
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, teacher_params, batch: Batch):
        key = jax.random.fold_in(jax.random.PRNGKey(int(cfg.SEED)), state.step)
        k_teacher, k_student = jax.random.split(key)
        if is_fpn:
            teacher = generate_soften_proposals_fpn(
                model_teacher, teacher_params, batch.pixels, batch.sizes,
                k_teacher, cfg,
            )
        else:
            # anchors from the traced batch shape: one cached executable
            # per canvas orientation (see make_train_step)
            anchors = anchors_for_shape(
                cfg, batch.pixels.shape[1], batch.pixels.shape[2], stride
            )
            teacher = generate_soften_proposals(
                model_teacher, teacher_params, batch.pixels, batch.sizes,
                k_teacher, cfg, anchors,
            )
        teacher = jax.tree_util.tree_map(jax.lax.stop_gradient, teacher)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, teacher_params, teacher, batch, k_student
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        return TrainState(params, opt_state, state.step + 1), metrics

    anchors = (None if is_fpn else
               anchors_for_shape(cfg, canvas_hw[0], canvas_hw[1], stride))
    return train_step, anchors
