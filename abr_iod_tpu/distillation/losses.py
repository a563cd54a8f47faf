"""ABR distillation losses (reference: maskrcnn_benchmark/distillation/
distillation.py) — pure jnp ports of the loss *formulas*, shaped for the
single fused teacher+student jit step.

All faithfully reproduce the reference's exact reductions, including its
quirks (documented inline) since they define the published mAP recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rpn_distillation_loss(
    obj_source, reg_source, obj_target, reg_target, bbox_threshold: float = 0.1
):
    """Filtered-L2 objectness + objectness-masked L2 on deltas
    (reference distillation.py:18-83, cls 'filtered_l2', bbox 'l2').

    obj_*: [B, H, W, A]; reg_*: [B, H, W, 4A] (single C4 level).
    Only locations where teacher objectness exceeds the student's
    contribute to the cls loss; deltas are masked where the difference
    exceeds ``bbox_threshold``.
    """
    obj_source = obj_source.astype(jnp.float32)
    obj_target = obj_target.astype(jnp.float32)
    diff = obj_source - obj_target
    cls_loss = jnp.mean(jnp.maximum(diff, 0.0) ** 2)

    b = obj_source.shape[0]
    a = obj_source.shape[-1]
    diff_f = diff.reshape(b, -1, 1)  # [B, HWA, 1]
    reg_s = reg_source.reshape(b, -1, a, 4).reshape(b, -1, 4).astype(jnp.float32)
    reg_t = reg_target.reshape(b, -1, a, 4).reshape(b, -1, 4).astype(jnp.float32)
    mask = (diff_f > bbox_threshold).astype(jnp.float32)
    l2 = ((reg_s * mask - reg_t * mask) ** 2).sum(-1)  # sum over the 4 coords
    bbs_loss = jnp.mean(l2)
    return cls_loss + bbs_loss


def _activation_at(f_map, temp: float = 2.0):
    """Spatial attention A = H*W*softmax(mean_c |F|^temp)
    (reference distillation.py:121-130). f_map: [N, P, P, C] (NHWC)."""
    n, h, w, _ = f_map.shape
    fea = jnp.mean(jnp.abs(f_map.astype(jnp.float32)) ** temp, axis=-1)  # [N,H,W]
    s = jax.nn.softmax(fea.reshape(n, h * w), axis=1).reshape(n, h, w)
    return h * w * s


def _wmean(per_sample, weights):
    """Mean over the leading N axis, optionally restricted to weights>0
    slots (the reference only ever distills over proposals that exist —
    random.sample draws without replacement, generalized_rcnn.py:147-151)."""
    per_sample = per_sample.astype(jnp.float32)
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def attentive_roi_distillation_loss(
    roi_feats_student, roi_feats_teacher, gamma=1.0, weights=None
):
    """ARD (reference distillation.py:86-118).

    roi_feats_*: [N, P, P, C] pooled RoI features; weights: optional [N]
    validity mask (padding slots contribute nothing).  NOTE: the reference
    computes the AFD weighting attention from the *student* map (its
    variable names are swapped at distillation.py:95-96); we reproduce
    that behavior exactly since it defines the published recipe.
    """
    att_from_student = _activation_at(roi_feats_student)
    att_from_teacher = _activation_at(roi_feats_teacher)

    pad = _wmean(
        jnp.mean(jnp.abs(att_from_student - att_from_teacher), axis=(1, 2)), weights
    )

    # eps guards sqrt's infinite gradient where the spatial softmax
    # underflows to exactly 0 (the reference's torch.sqrt has the same
    # singularity; float32 saturation makes it a real NaN source here)
    w = jnp.sqrt(att_from_student + 1e-6)[..., None]
    fs = roi_feats_student.astype(jnp.float32) * w
    ft = roi_feats_teacher.astype(jnp.float32) * w
    afd = _wmean(jnp.mean((fs - ft) ** 2, axis=(1, 2, 3)), weights)
    return afd + gamma * pad


def feature_distillation_loss(source_features, target_features):
    """'std' ablation: normalized, positive-part-filtered L1 over backbone
    maps (reference distillation.py:133-161, 'normalized_filtered_l1')."""
    total = 0.0
    for sf, tf in zip(source_features, target_features):
        sf = sf.astype(jnp.float32)
        tf = tf.astype(jnp.float32)
        ns = sf - jnp.mean(sf)
        nt = tf - jnp.mean(tf)
        total = total + jnp.mean(jnp.maximum(ns - nt, 0.0))
    return total


def roi_distillation_losses(
    soften_scores,
    soften_bboxes,
    target_scores,
    target_bboxes,
    dist: str = "id",
    weights=None,
):
    """Inclusive Distillation ('id') or mean-normalized L2 ('l2') over the
    teacher's soften proposals (reference distillation.py:164-240).

    soften_scores [N, C_old], target_scores [N, C_new >= C_old];
    *_bboxes [N, C, 4]; weights: optional [N] validity mask.
    """
    soften_scores = soften_scores.astype(jnp.float32)
    target_scores = target_scores.astype(jnp.float32)
    c_old = soften_scores.shape[-1]
    c_new = target_scores.shape[-1]

    if dist == "id":
        # unbiased cross-entropy: student's {bg ∪ new classes} logits fold
        # into the background term (distillation.py:189-199)
        den = jax.nn.logsumexp(target_scores, axis=1)
        out_no_bkg = target_scores[:, 1:c_old] - den[:, None]
        bkg_cols = jnp.concatenate(
            [target_scores[:, 0:1], target_scores[:, c_old:c_new]], axis=1
        )
        out_bkg = jax.nn.logsumexp(bkg_cols, axis=1) - den
        labels = jax.nn.softmax(soften_scores, axis=1)
        loss = (
            labels[:, 0] * out_bkg + jnp.sum(labels[:, 1:] * out_no_bkg, axis=1)
        ) / c_old
        cls_loss = -_wmean(loss, weights)
    elif dist == "l2":
        # 'normalization' preprocess: subtract per-row mean, truncate the
        # student to the teacher's C_old columns (distillation.py:170-177)
        ns = soften_scores - jnp.mean(soften_scores, axis=1, keepdims=True)
        nt = target_scores - jnp.mean(target_scores, axis=1, keepdims=True)
        cls_loss = _wmean(jnp.mean((ns - nt[:, :c_old]) ** 2, axis=1), weights)
    else:
        raise ValueError(f"unknown roi distillation type {dist!r}")

    # bbox L2 excluding background, truncated to teacher classes
    # (distillation.py:204-215)
    sb = soften_bboxes[:, 1:, :].astype(jnp.float32)
    tb = target_bboxes[:, 1:c_old, :].astype(jnp.float32)
    bbox_loss = _wmean(jnp.mean(jnp.sum((tb - sb) ** 2, axis=2), axis=1), weights)
    return cls_loss + bbox_loss
