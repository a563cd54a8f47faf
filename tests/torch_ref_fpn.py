"""An independent torch re-statement of the reference FPN Faster R-CNN
forward (modeling/backbone/fpn.py:7-79 + rpn/rpn.py USE_FPN shared head +
roi_box_feature_extractors.py FPN2MLPFeatureExtractor:58-101 +
roi_box_predictors.py FPNPredictor), used as the FPN full-model parity
oracle:

  stem + caffe2 bottleneck stages 1-4 -> [C2, C3, C4, C5]
  -> FPN: lateral 1x1 (fpn_inner), top-down nearest x2 upsample, output
     3x3 (fpn_layer), P6 = maxpool(kernel 1, stride 2) of P5
  -> one RPN head (3x3 conv+relu, 1x1 cls/bbox) applied to EVERY level
  -> [numpy] per-RoI level assignment (poolers.py LevelMapper: lvl0 +
     log2(sqrt(area)/224 + 1e-6), +1 area convention) and per-level
     RoIAlign via tests/oracles.py
  -> fc6 -> relu -> fc7 -> relu -> cls_score / bbox_pred

Like torch_ref_model.py, every formula is re-derived from the reference's
published semantics; nothing is imported from abr_iod_tpu so a drift in
our jax model cannot cancel out in the oracle.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.oracles import roi_align_numpy
from tests.torch_ref_model import Bottleneck, FrozenBN


class TorchRefFPN(nn.Module):
    """4-stage backbone + FPN + shared RPN head + 2-MLP box head."""

    def __init__(self, stages, width_per_group, res2_out, fpn_out,
                 num_anchors, num_classes, representation_size,
                 pooler_resolution=7):
        super().__init__()
        assert len(stages) == 4, "FPN needs C2..C5"
        self.stem_conv = nn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.stem_bn = FrozenBN(64)
        layers, cin = [], 64
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

        self.inner = nn.ModuleList([
            nn.Conv2d(res2_out * 2 ** i, fpn_out, 1) for i in range(4)
        ])
        self.layer = nn.ModuleList([
            nn.Conv2d(fpn_out, fpn_out, 3, padding=1) for _ in range(4)
        ])

        self.rpn_conv = nn.Conv2d(fpn_out, fpn_out, 3, padding=1)
        self.rpn_cls = nn.Conv2d(fpn_out, num_anchors, 1)
        self.rpn_bbox = nn.Conv2d(fpn_out, num_anchors * 4, 1)

        in_dim = fpn_out * pooler_resolution * pooler_resolution
        self.fc6 = nn.Linear(in_dim, representation_size)
        self.fc7 = nn.Linear(representation_size, representation_size)
        self.cls_score = nn.Linear(representation_size, num_classes)
        self.bbox_pred = nn.Linear(representation_size, num_classes * 4)

    def backbone(self, x):
        """pixels -> [C2, C3, C4, C5]."""
        x = F.relu(self.stem_bn(self.stem_conv(x)))
        x = F.max_pool2d(x, 3, 2, padding=1)
        feats = []
        for stage in self.stages:
            x = stage(x)
            feats.append(x)
        return feats

    def fpn(self, feats):
        """[C2..C5] -> [P2, P3, P4, P5, P6] (fpn.py:41-75 + LastLevelMaxPool)."""
        inner = [m(c) for m, c in zip(self.inner, feats)]
        outs = [None] * 4
        last = inner[-1]
        outs[-1] = self.layer[-1](last)
        for i in range(2, -1, -1):
            last = inner[i] + F.interpolate(last, scale_factor=2, mode="nearest")
            outs[i] = self.layer[i](last)
        outs.append(F.max_pool2d(outs[-1], 1, 2, 0))
        return outs

    def rpn(self, pyramid):
        """The SAME head on every level (rpn.py:114-129 / :188)."""
        out = []
        for p in pyramid:
            t = F.relu(self.rpn_conv(p))
            out.append((self.rpn_cls(t), self.rpn_bbox(t)))
        return out

    def box_head(self, pooled):
        """pooled [N, C, P, P] -> (logits [N,K], deltas [N,4K])."""
        x = pooled.flatten(start_dim=1)
        x = F.relu(self.fc6(x))
        x = F.relu(self.fc7(x))
        return self.cls_score(x), self.bbox_pred(x)


class TorchRefRetinaNet(nn.Module):
    """4-stage backbone + FPN with LastLevelP6P7 (fpn.py:80-99, USE_C5) +
    the shared RetinaNet conv towers (retinanet/retinanet.py:24-64):
    pyramid is P3..P7."""

    def __init__(self, stages, width_per_group, res2_out, channels,
                 num_anchors, num_classes_m1, num_convs):
        super().__init__()
        assert len(stages) == 4
        self.stem_conv = nn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.stem_bn = FrozenBN(64)
        layers, cin = [], 64
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
        self.inner = nn.ModuleList([
            nn.Conv2d(res2_out * 2 ** i, channels, 1) for i in range(4)
        ])
        self.layer = nn.ModuleList([
            nn.Conv2d(channels, channels, 3, padding=1) for _ in range(4)
        ])
        self.p6 = nn.Conv2d(res2_out * 8, channels, 3, 2, padding=1)
        self.p7 = nn.Conv2d(channels, channels, 3, 2, padding=1)
        self.cls_tower = nn.ModuleList([
            nn.Conv2d(channels, channels, 3, padding=1)
            for _ in range(num_convs)
        ])
        self.bbox_tower = nn.ModuleList([
            nn.Conv2d(channels, channels, 3, padding=1)
            for _ in range(num_convs)
        ])
        self.cls_logits = nn.Conv2d(
            channels, num_anchors * num_classes_m1, 3, padding=1)
        self.bbox_pred = nn.Conv2d(channels, num_anchors * 4, 3, padding=1)

    def pyramid(self, x):
        x = F.relu(self.stem_bn(self.stem_conv(x)))
        x = F.max_pool2d(x, 3, 2, padding=1)
        feats = []
        for stage in self.stages:
            x = stage(x)
            feats.append(x)
        inner = [m(c) for m, c in zip(self.inner, feats)]
        outs = [None] * 4
        last = inner[-1]
        outs[-1] = self.layer[-1](last)
        for i in range(2, -1, -1):
            last = inner[i] + F.interpolate(last, scale_factor=2, mode="nearest")
            outs[i] = self.layer[i](last)
        p6 = self.p6(feats[-1])  # on C5 (USE_C5)
        p7 = self.p7(F.relu(p6))
        return outs[1:] + [p6, p7]  # P3..P7

    def head(self, pyramid):
        out = []
        for p in pyramid:
            c = p
            for conv in self.cls_tower:
                c = F.relu(conv(c))
            t = p
            for conv in self.bbox_tower:
                t = F.relu(conv(t))
            out.append((self.cls_logits(c), self.bbox_pred(t)))
        return out


def copy_flax_retinanet_params_to_torch(params, model: TorchRefRetinaNet):
    """Copy an abr_iod_tpu RetinaNetDetector param tree into the oracle."""
    p = params["params"]

    def conv_w(tree):
        return torch.from_numpy(np.array(tree["kernel"]).transpose(3, 2, 0, 1))

    def set_conv(dst, tree):
        dst.weight.copy_(conv_w(tree))
        dst.bias.copy_(torch.from_numpy(np.array(tree["bias"])))

    def set_bn(dst, tree):
        for name in ("weight", "bias", "running_mean", "running_var"):
            getattr(dst, name).copy_(torch.from_numpy(np.array(tree[name])))

    def set_block(dst, tree):
        if dst.has_down:
            dst.downsample_conv.weight.copy_(conv_w(tree["downsample_conv"]))
            set_bn(dst.downsample_bn, tree["downsample_bn"])
        for i in (1, 2, 3):
            getattr(dst, f"conv{i}").weight.copy_(conv_w(tree[f"conv{i}"]))
            set_bn(getattr(dst, f"bn{i}"), tree[f"bn{i}"])

    body = p["backbone"]["body"]
    fpn = p["backbone"]["fpn"]
    head = p["head"]
    with torch.no_grad():
        model.stem_conv.weight.copy_(conv_w(body["stem"]["conv1"]))
        set_bn(model.stem_bn, body["stem"]["bn1"])
        for idx, stage in enumerate(model.stages):
            tree = body[f"layer{idx + 1}"]
            for j, block in enumerate(stage):
                set_block(block, tree[f"block{j}"])
        for i in range(4):
            set_conv(model.inner[i], fpn[f"fpn_inner{i + 1}"])
            set_conv(model.layer[i], fpn[f"fpn_layer{i + 1}"])
        set_conv(model.p6, fpn["p6"])
        set_conv(model.p7, fpn["p7"])
        for i, conv in enumerate(model.cls_tower):
            set_conv(conv, head[f"cls_tower{i}"])
        for i, conv in enumerate(model.bbox_tower):
            set_conv(conv, head[f"bbox_tower{i}"])
        set_conv(model.cls_logits, head["cls_logits"])
        set_conv(model.bbox_pred, head["bbox_pred"])
    return model


# ------------------------------------------------------------- numpy refs
def fpn_level_np(rois, k_min=2, k_max=5, canonical_scale=224,
                 canonical_level=4):
    """poolers.py LevelMapper.__call__ — +1 area convention, eps 1e-6.
    Returns a 0-based index into [P2..P5]."""
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    s = np.sqrt(w * h)
    lvl = np.floor(canonical_level + np.log2(s / canonical_scale + 1e-6))
    return (np.clip(lvl, k_min, k_max) - k_min).astype(np.int64)


def fpn_roi_align_np(feats_hwc, rois, output_size=7,
                     scales=(0.25, 0.125, 0.0625, 0.03125),
                     sampling_ratio=2):
    """Multi-level RoIAlign for one image (poolers.py Pooler.forward):
    each RoI pools from its assigned level only."""
    lvl = fpn_level_np(rois)
    c = feats_hwc[0].shape[-1]
    out = np.zeros((len(rois), output_size, output_size, c), np.float32)
    for i, (roi, l) in enumerate(zip(rois, lvl)):
        out[i] = roi_align_numpy(
            feats_hwc[l], roi[None], output_size, scales[l], sampling_ratio
        )[0]
    return out


# ------------------------------------------------------------- weights
def copy_flax_fpn_params_to_torch(params, model: TorchRefFPN):
    """Copy an abr_iod_tpu FasterRCNNFPN param tree into the torch oracle.
    flax convs HWIO -> torch OIHW; flax Dense [in,out] -> torch [out,in];
    fc6 additionally permutes its input axis from the NHWC flatten order
    (P,P,C) to torch's (C,P,P)."""
    p = params["params"]

    def conv_w(tree):
        return torch.from_numpy(np.array(tree["kernel"]).transpose(3, 2, 0, 1))

    def set_conv(dst, tree):
        dst.weight.copy_(conv_w(tree))
        dst.bias.copy_(torch.from_numpy(np.array(tree["bias"])))

    def set_bn(dst, tree):
        for name in ("weight", "bias", "running_mean", "running_var"):
            getattr(dst, name).copy_(torch.from_numpy(np.array(tree[name])))

    def set_block(dst, tree):
        if dst.has_down:
            dst.downsample_conv.weight.copy_(conv_w(tree["downsample_conv"]))
            set_bn(dst.downsample_bn, tree["downsample_bn"])
        for i in (1, 2, 3):
            getattr(dst, f"conv{i}").weight.copy_(conv_w(tree[f"conv{i}"]))
            set_bn(getattr(dst, f"bn{i}"), tree[f"bn{i}"])

    body = p["backbone"]["body"]
    fpn = p["backbone"]["fpn"]
    roi = p["roi_heads"]
    res = model.cls_score.in_features  # representation_size
    pres = int(round((model.fc6.in_features // model.inner[0].out_channels)
                     ** 0.5))
    c_fpn = model.inner[0].out_channels
    with torch.no_grad():
        model.stem_conv.weight.copy_(conv_w(body["stem"]["conv1"]))
        set_bn(model.stem_bn, body["stem"]["bn1"])
        for idx, stage in enumerate(model.stages):
            tree = body[f"layer{idx + 1}"]
            for j, block in enumerate(stage):
                set_block(block, tree[f"block{j}"])
        for i in range(4):
            set_conv(model.inner[i], fpn[f"fpn_inner{i + 1}"])
            set_conv(model.layer[i], fpn[f"fpn_layer{i + 1}"])
        rpn = p["rpn"]
        for dst, src in ((model.rpn_conv, rpn["conv"]),
                         (model.rpn_cls, rpn["cls_logits"]),
                         (model.rpn_bbox, rpn["bbox_pred"])):
            set_conv(dst, src)
        # fc6: [P*P*C, rep] in flax (P,P,C) flatten order -> torch (C,P,P)
        k6 = np.asarray(roi["fc6"]["kernel"]).reshape(pres, pres, c_fpn, res)
        k6 = k6.transpose(2, 0, 1, 3).reshape(c_fpn * pres * pres, res)
        model.fc6.weight.copy_(torch.from_numpy(k6.T.copy()))
        model.fc6.bias.copy_(torch.from_numpy(np.array(roi["fc6"]["bias"])))
        for dst, src in ((model.fc7, roi["fc7"]),
                         (model.cls_score, roi["cls_score"]),
                         (model.bbox_pred, roi["bbox_pred"])):
            dst.weight.copy_(
                torch.from_numpy(np.array(src["kernel"]).T.copy()))
            dst.bias.copy_(torch.from_numpy(np.array(src["bias"])))
    return model
