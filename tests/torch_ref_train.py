"""Torch/numpy re-statement of the reference's TRAINING-side math, used by
the full train-step parity test (tests/test_train_parity.py).

Everything here is re-derived from the reference's published semantics —
NOT from abr_iod_tpu — so drift in our jax training path cannot cancel out:

  * IoU / matcher        — structures/boxlist_ops.py:53-76 (+1 convention),
                           modeling/matcher.py:5-112 (two thresholds,
                           low-quality-match recovery)
  * box encode           — modeling/box_coder.py:25-49 (+1 widths)
  * anchor visibility    — modeling/rpn/anchor_generator.py:103-122
  * smooth L1            — layers/smooth_l1_loss.py
  * differentiable RoIAlign — csrc/cuda/ROIAlign_cuda.cu:15-120 semantics,
                           expressed as a constant bilinear-tap weight
                           matrix (built in numpy from the stop-gradient
                           rois) einsum'd with the torch feature map, so
                           gradients flow to the backbone exactly like the
                           reference autograd op
  * SGD + warmup-multistep — solver/build.py:7-26, solver/lr_scheduler.py
"""

from __future__ import annotations

import numpy as np
import torch

BELOW = -1
BETWEEN = -2


def iou_np(a, b):
    """Pairwise IoU [N,M] with the Detectron +1 pixel convention."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def match_np(quality, high, low, allow_low_quality):
    """quality [M_gt, N_pred] -> matches [N_pred] (gt index or sentinel)."""
    matched_vals = quality.max(axis=0)
    all_matches = quality.argmax(axis=0)
    out = all_matches.copy()
    out[matched_vals < low] = BELOW
    out[(matched_vals >= low) & (matched_vals < high)] = BETWEEN
    if allow_low_quality:
        highest_per_gt = quality.max(axis=1)
        _, pred_inds = np.nonzero(quality == highest_per_gt[:, None])
        out[pred_inds] = all_matches[pred_inds]
    return out


def encode_np(gt, proposals, weights):
    """BoxCoder.encode (reference box_coder.py:25-49)."""
    ex_w = proposals[:, 2] - proposals[:, 0] + 1.0
    ex_h = proposals[:, 3] - proposals[:, 1] + 1.0
    ex_cx = proposals[:, 0] + 0.5 * ex_w
    ex_cy = proposals[:, 1] + 0.5 * ex_h
    gt_w = gt[:, 2] - gt[:, 0] + 1.0
    gt_h = gt[:, 3] - gt[:, 1] + 1.0
    gt_cx = gt[:, 0] + 0.5 * gt_w
    gt_cy = gt[:, 1] + 0.5 * gt_h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=1,
    ).astype(np.float32)


def anchor_visibility_np(anchors, h, w, straddle=0.0):
    """anchor_generator.py:103-122 straddle rule."""
    return (
        (anchors[:, 0] >= -straddle)
        & (anchors[:, 1] >= -straddle)
        & (anchors[:, 2] < w + straddle)
        & (anchors[:, 3] < h + straddle)
    )


def smooth_l1_t(x, beta):
    """layers/smooth_l1_loss.py: 0.5x^2/beta below beta, |x|-beta/2 above."""
    ax = x.abs()
    return torch.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _bilinear_taps(h, w, y, x):
    """(index, weight) taps of one bilinear sample, exact CUDA-kernel edge
    semantics (ROIAlign_cuda.cu bilinear_interpolate)."""
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return []
    y, x = max(y, 0.0), max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return [
        ((y_low, x_low), hy * hx),
        ((y_low, x_high), hy * lx),
        ((y_high, x_low), ly * hx),
        ((y_high, x_high), ly * lx),
    ]


def roi_align_weight_matrix(rois, H, W, output_size, spatial_scale,
                            sampling_ratio):
    """[R, P, P, H, W] bilinear pooling weights (constant given rois)."""
    R, P = rois.shape[0], output_size
    Wm = np.zeros((R, P, P, H, W), np.float64)
    for r in range(R):
        sw = rois[r, 0] * spatial_scale
        sh = rois[r, 1] * spatial_scale
        ew = rois[r, 2] * spatial_scale
        eh = rois[r, 3] * spatial_scale
        rw, rh = max(ew - sw, 1.0), max(eh - sh, 1.0)
        bh, bw = rh / P, rw / P
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / P))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / P))
        for ph in range(P):
            for pw in range(P):
                for iy in range(gh):
                    y = sh + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        x = sw + pw * bw + (ix + 0.5) * bw / gw
                        for (yy, xx), wt in _bilinear_taps(H, W, y, x):
                            Wm[r, ph, pw, yy, xx] += wt / (gh * gw)
    return Wm.astype(np.float32)


def roi_align_torch(feat_hwc, rois_np, output_size, spatial_scale,
                    sampling_ratio):
    """Differentiable RoIAlign: feat [H,W,C] torch (grad), rois numpy.
    Returns [R,P,P,C]."""
    H, W = feat_hwc.shape[:2]
    Wm = torch.from_numpy(
        roi_align_weight_matrix(rois_np, H, W, output_size, spatial_scale,
                                sampling_ratio)
    )
    return torch.einsum("rpqhw,hwc->rpqc", Wm, feat_hwc)


def inclusive_ce_torch(logits, labels, n_old):
    """Inclusive Classification Loss (reference box_head/loss.py:151-159):
    {bg ∪ old classes} logits logsumexp-fold into the background term.
    logits [N,C] (grad), labels [N] int64; returns per-sample NLL [N]."""
    den = torch.logsumexp(logits, dim=1)
    out_bg = torch.logsumexp(logits[:, : n_old + 1], dim=1) - den
    out_new = logits[:, n_old + 1:] - den.unsqueeze(1)
    log_probs = torch.cat(
        [out_bg.unsqueeze(1),
         torch.zeros(logits.shape[0], n_old, dtype=logits.dtype),
         out_new],
        dim=1,
    )
    return -log_probs.gather(1, labels.unsqueeze(1)).squeeze(1)


def id_distillation_torch(soften_scores, soften_bboxes, t_cls, t_reg):
    """Inclusive Distillation 'id' + bbox L2 (reference
    distillation.py:164-240) over ONE image's proposals; returns per-sample
    (cls_term [N], bbox_term [N]) so the caller can batch-mean."""
    c_old = soften_scores.shape[1]
    den = torch.logsumexp(t_cls, dim=1)
    out_no_bkg = t_cls[:, 1:c_old] - den.unsqueeze(1)
    bkg_cols = torch.cat([t_cls[:, 0:1], t_cls[:, c_old:]], dim=1)
    out_bkg = torch.logsumexp(bkg_cols, dim=1) - den
    labels = torch.softmax(soften_scores, dim=1)
    cls_term = -(
        labels[:, 0] * out_bkg + (labels[:, 1:] * out_no_bkg).sum(1)
    ) / c_old
    bbox_term = ((t_reg[:, 1:c_old] - soften_bboxes[:, 1:]) ** 2).sum(2).mean(1)
    return cls_term, bbox_term


def ard_torch(student_pool, teacher_pool, gamma):
    """ARD (reference distillation.py:86-130; attention from the STUDENT
    map, reproducing the reference's swapped variables) — per-sample
    (afd [N], pad [N])."""
    def activation_at(f):
        n, p = f.shape[0], f.shape[1]
        fea = f.abs().pow(2.0).mean(-1)
        s = torch.softmax(fea.reshape(n, -1), dim=1).reshape(n, p, p)
        return p * p * s

    att_s = activation_at(student_pool)
    att_t = activation_at(teacher_pool)
    pad = (att_s - att_t).abs().mean(dim=(1, 2))
    w = torch.sqrt(att_s + 1e-6).unsqueeze(-1)
    afd = ((student_pool * w - teacher_pool * w) ** 2).mean(dim=(1, 2, 3))
    return afd, gamma * pad


def make_reference_sgd(model, frozen_prefixes, base_lr, momentum, weight_decay,
                       bias_lr_factor, weight_decay_bias):
    """solver/build.py:7-26 — per-param groups: biases lr*factor + own wd;
    frozen prefixes excluded (requires_grad False)."""
    weights, biases = [], []
    for name, p in model.named_parameters():
        if any(name.startswith(f) for f in frozen_prefixes):
            p.requires_grad_(False)
            continue
        (biases if name.endswith("bias") else weights).append(p)
    return torch.optim.SGD(
        [
            {"params": weights, "lr": base_lr, "weight_decay": weight_decay},
            {"params": biases, "lr": base_lr * bias_lr_factor,
             "weight_decay": weight_decay_bias},
        ],
        lr=base_lr,
        momentum=momentum,
    )
