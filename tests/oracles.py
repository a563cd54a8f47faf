"""Numpy reference oracles for kernel parity tests.

These re-implement (in slow, obvious numpy) the semantics of the
reference's CPU kernels so Pallas/XLA implementations can be tested
against them:
  * greedy NMS      — csrc/cpu/nms_cpu.cpp (+1 pixel convention)
  * RoIAlign        — csrc/cpu/ROIAlign_cpu.cpp / cuda/ROIAlign_cuda.cu
  * focal loss      — layers/sigmoid_focal_loss.py:40-52
They are written from the kernels' mathematical definitions, not copied.
"""

import numpy as np


def nms_numpy(boxes, scores, thresh):
    """Greedy NMS, +1 convention. Returns kept indices in score order."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
    return np.array(keep, dtype=np.int64)


def _bilinear(data, h, w, y, x):
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
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
    return (
        hy * hx * data[y_low, x_low]
        + hy * lx * data[y_low, x_high]
        + ly * hx * data[y_high, x_low]
        + ly * lx * data[y_high, x_high]
    )


def roi_align_numpy(features, rois, output_size, spatial_scale, sampling_ratio):
    """features [H,W,C], rois [R,4] → [R,P,P,C]; exact CUDA kernel semantics."""
    H, W, C = features.shape
    R = rois.shape[0]
    P = output_size
    out = np.zeros((R, P, P, C), dtype=np.float64)
    for r in range(R):
        sw = rois[r, 0] * spatial_scale
        sh = rois[r, 1] * spatial_scale
        ew = rois[r, 2] * spatial_scale
        eh = rois[r, 3] * spatial_scale
        rw = max(ew - sw, 1.0)
        rh = max(eh - sh, 1.0)
        bh, bw = rh / P, rw / P
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / P))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / P))
        for ph in range(P):
            for pw in range(P):
                acc = np.zeros((C,), dtype=np.float64)
                for iy in range(gh):
                    y = sh + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        x = sw + pw * bw + (ix + 0.5) * bw / gw
                        for c in range(C):
                            acc[c] += _bilinear(features[:, :, c], H, W, y, x)
                out[r, ph, pw] = acc / (gh * gw)
    return out.astype(np.float32)


def sigmoid_focal_loss_numpy(logits, targets, gamma, alpha):
    """[N,K] elementwise focal loss, classes are 1..K."""
    N, K = logits.shape
    p = 1.0 / (1.0 + np.exp(-logits))
    class_range = np.arange(1, K + 1)[None, :]
    t = targets[:, None]
    term1 = (1 - p) ** gamma * np.log(p)
    term2 = p**gamma * np.log(1 - p)
    pos = (t == class_range).astype(np.float64)
    neg = ((t != class_range) & (t >= 0)).astype(np.float64)
    return -pos * term1 * alpha - neg * term2 * (1 - alpha)
