"""An independent torch re-statement of the reference forward pass, used
as the full-model parity oracle (reference semantics per
modeling/detector/generalized_rcnn.py:50-119, backbone/resnet.py,
rpn/rpn.py, roi_heads/box_head/*):

  stem(7x7/2 + FrozenBN + relu + maxpool3x3/2)
  -> caffe2 bottleneck stages (stride in the first 1x1, FrozenBN, no eps)
  -> RPN head (3x3 conv+relu, 1x1 cls/bbox)
  -> [numpy] proposal selection: sigmoid, top-k, decode(1,1,1,1), clip,
     remove-small, NMS(.7) — Detectron +1 conventions throughout
  -> [numpy] RoIAlign (tests/oracles.py, exact reference CPU kernel math)
  -> res5 stage (first stride 2) + global avg pool + cls/bbox FC
  -> [numpy] postprocess: softmax, decode(10,10,5,5), clip, thresh .05,
     per-class NMS(.5), top detections_per_img

This file deliberately re-derives every formula from the reference's
published semantics rather than importing anything from abr_iod_tpu, so a
drift in our jax model cannot cancel out in the oracle.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.oracles import nms_numpy, roi_align_numpy


class FrozenBN(nn.Module):
    """y = x*weight/sqrt(running_var) + (bias - running_mean*weight/sqrt(rv));
    no eps, matching reference layers/batch_norm.py."""

    def __init__(self, n):
        super().__init__()
        for name in ("weight", "bias", "running_mean", "running_var"):
            self.register_buffer(name, torch.zeros(n))
        self.running_var.fill_(1.0)

    def forward(self, x):
        scale = self.weight / torch.sqrt(self.running_var)
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class Bottleneck(nn.Module):
    def __init__(self, cin, cmid, cout, stride=1):
        super().__init__()
        self.has_down = cin != cout or stride != 1
        if self.has_down:
            self.downsample_conv = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.downsample_bn = FrozenBN(cout)
        # caffe2 style: stride lives in the FIRST 1x1 (reference resnet.py
        # Bottleneck, cfg STRIDE_IN_1X1=True)
        self.conv1 = nn.Conv2d(cin, cmid, 1, stride, bias=False)
        self.bn1 = FrozenBN(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, 1, padding=1, bias=False)
        self.bn2 = FrozenBN(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, 1, bias=False)
        self.bn3 = FrozenBN(cout)

    def forward(self, x):
        res = x
        if self.has_down:
            res = self.downsample_bn(self.downsample_conv(x))
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + res)


class TorchRefC4(nn.Module):
    """Stem + stages → C4 map, RPN head, res5 box head."""

    def __init__(self, stages, width_per_group, res2_out, num_anchors,
                 num_classes, res5_blocks, res5_bottleneck, res5_out):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.stem_bn = FrozenBN(64)
        layers = []
        cin = 64
        for idx, n_blocks in enumerate(stages):
            factor = 2 ** idx
            cmid, cout = width_per_group * factor, res2_out * factor
            stage = []
            for j in range(n_blocks):
                stride = 1 if idx == 0 or j > 0 else 2
                stage.append(Bottleneck(cin, cmid, cout, stride))
                cin = cout
            layers.append(nn.Sequential(*stage))
        self.stages = nn.ModuleList(layers)
        c4 = cin

        self.rpn_conv = nn.Conv2d(c4, c4, 3, padding=1)
        self.rpn_cls = nn.Conv2d(c4, num_anchors, 1)
        self.rpn_bbox = nn.Conv2d(c4, num_anchors * 4, 1)

        res5 = [Bottleneck(c4, res5_bottleneck, res5_out, 2)]
        for _ in range(res5_blocks - 1):
            res5.append(Bottleneck(res5_out, res5_bottleneck, res5_out, 1))
        self.res5 = nn.Sequential(*res5)
        self.cls_score = nn.Linear(res5_out, num_classes)
        self.bbox_pred = nn.Linear(res5_out, num_classes * 4)

    def backbone(self, x):
        x = F.relu(self.stem_bn(self.stem_conv(x)))
        x = F.max_pool2d(x, 3, 2, padding=1)
        for stage in self.stages:
            x = stage(x)
        return x

    def rpn(self, c4):
        t = F.relu(self.rpn_conv(c4))
        return self.rpn_cls(t), self.rpn_bbox(t)

    def box_head(self, pooled):
        """pooled: [N, C, P, P] → (logits [N, K], deltas [N, 4K])"""
        x = self.res5(pooled)
        x = x.mean(dim=(2, 3))
        return self.cls_score(x), self.bbox_pred(x)


# ---------------------------------------------------------------- numpy refs
def decode_boxes_np(deltas, boxes, weights):
    """Detectron BoxCoder.decode (+1 conventions), reference
    modeling/box_coder.py:50-79."""
    boxes = boxes.astype(np.float64)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = np.clip(deltas[:, 2::4] / ww, None, np.log(1000.0 / 16))
    dh = np.clip(deltas[:, 3::4] / wh, None, np.log(1000.0 / 16))
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = np.exp(dw) * widths[:, None]
    pred_h = np.exp(dh) * heights[:, None]
    out = np.zeros_like(deltas, dtype=np.float64)
    out[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    out[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    out[:, 2::4] = pred_ctr_x + 0.5 * pred_w - 1
    out[:, 3::4] = pred_ctr_y + 0.5 * pred_h - 1
    return out.astype(np.float32)


def clip_boxes_np(boxes, size_hw):
    h, w = size_hw
    out = boxes.copy()
    out[..., 0::2] = np.clip(out[..., 0::2], 0, w - 1)
    out[..., 1::2] = np.clip(out[..., 1::2], 0, h - 1)
    return out


def select_proposals_np(obj_logits, deltas, anchors, size_hw,
                        pre_nms_top_n, post_nms_top_n, nms_thresh=0.7,
                        min_size=0.0):
    """Reference rpn/inference.py:76-118 for one image; obj [HWA],
    deltas [HWA,4]."""
    scores = 1.0 / (1.0 + np.exp(-obj_logits.astype(np.float64)))
    k = min(pre_nms_top_n, scores.shape[0])
    order = np.argsort(-scores, kind="stable")[:k]
    boxes = decode_boxes_np(deltas[order], anchors[order], (1.0, 1.0, 1.0, 1.0))
    boxes = clip_boxes_np(boxes, size_hw)
    sc = scores[order]
    if min_size > 0:
        ws = boxes[:, 2] - boxes[:, 0] + 1
        hs = boxes[:, 3] - boxes[:, 1] + 1
        keep = (ws >= min_size) & (hs >= min_size)
        boxes, sc = boxes[keep], sc[keep]
    keep = nms_numpy(boxes, sc, nms_thresh)[:post_nms_top_n]
    return boxes[keep], sc[keep]


def postprocess_np(cls_logits, box_reg, prop_boxes, size_hw,
                   score_thresh=0.05, nms_thresh=0.5, detections_per_img=100):
    """Reference roi_heads/box_head/inference.py:105-151 for one image."""
    logits = cls_logits.astype(np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    c = logits.shape[1]
    decoded = decode_boxes_np(box_reg, prop_boxes, (10.0, 10.0, 5.0, 5.0))
    decoded = clip_boxes_np(decoded.reshape(-1, c, 4), size_hw)
    all_boxes, all_scores, all_labels = [], [], []
    for j in range(1, c):
        mask = probs[:, j] > score_thresh
        bj, sj = decoded[mask, j], probs[mask, j]
        keep = nms_numpy(bj, sj, nms_thresh)
        all_boxes.append(bj[keep])
        all_scores.append(sj[keep])
        all_labels.append(np.full(len(keep), j, np.int32))
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4))
    scores = np.concatenate(all_scores) if all_scores else np.zeros((0,))
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0,), np.int32)
    if len(scores) > detections_per_img:
        order = np.argsort(-scores, kind="stable")[:detections_per_img]
        boxes, scores, labels = boxes[order], scores[order], labels[order]
    return boxes.astype(np.float32), scores.astype(np.float32), labels


# ---------------------------------------------------------------- weights
def copy_flax_params_to_torch(params, model: TorchRefC4):
    """Copy an abr_iod_tpu FasterRCNN param tree into the torch oracle.
    flax convs are HWIO → torch OIHW; flax Dense kernels [in,out] →
    torch Linear [out,in]."""
    p = params["params"]

    def conv_w(tree):
        # np.array (copy) keeps torch off the non-writable JAX export buffer
        return torch.from_numpy(np.array(tree["kernel"]).transpose(3, 2, 0, 1))

    def set_bn(dst: FrozenBN, tree):
        for name in ("weight", "bias", "running_mean", "running_var"):
            getattr(dst, name).copy_(torch.from_numpy(np.array(tree[name])))

    def set_block(dst: Bottleneck, tree):
        with torch.no_grad():
            if dst.has_down:
                dst.downsample_conv.weight.copy_(conv_w(tree["downsample_conv"]))
                set_bn(dst.downsample_bn, tree["downsample_bn"])
            for i in (1, 2, 3):
                getattr(dst, f"conv{i}").weight.copy_(conv_w(tree[f"conv{i}"]))
                set_bn(getattr(dst, f"bn{i}"), tree[f"bn{i}"])

    bb = p["backbone"]
    with torch.no_grad():
        model.stem_conv.weight.copy_(conv_w(bb["stem"]["conv1"]))
        set_bn(model.stem_bn, bb["stem"]["bn1"])
        for idx, stage in enumerate(model.stages):
            tree = bb[f"layer{idx + 1}"]
            for j, block in enumerate(stage):
                set_block(block, tree[f"block{j}"])
        rpn = p["rpn"]
        for dst, src in ((model.rpn_conv, rpn["conv"]),
                         (model.rpn_cls, rpn["cls_logits"]),
                         (model.rpn_bbox, rpn["bbox_pred"])):
            dst.weight.copy_(conv_w(src))
            dst.bias.copy_(torch.from_numpy(np.array(src["bias"])))
        roi = p["roi_heads"]
        for j, block in enumerate(model.res5):
            set_block(block, roi["res5"]["layer4"][f"block{j}"])
        for dst, src in ((model.cls_score, roi["cls_score"]),
                         (model.bbox_pred, roi["bbox_pred"])):
            dst.weight.copy_(
                torch.from_numpy(np.array(src["kernel"]).T.copy())
            )
            dst.bias.copy_(torch.from_numpy(np.array(src["bias"])))
    return model
