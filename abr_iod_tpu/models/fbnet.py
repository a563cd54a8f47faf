"""FBNet mobile detector family.

Reference: modeling/backbone/{fbnet,fbnet_builder,fbnet_modeldef}.py —
a primitive-op registry (inverted-residual variants, skip, cascade conv,
shift, shuffle, SE) driven by arch-definition tables that carve one op
list into backbone / rpn / bbox / mask stages, producing the trunk
(fbnet.py:34-53), FBNetRPNHead (fbnet.py:121-144) and the RoI feature
extractors (fbnet.py:147-190).

TPU-native shape: the same op algebra in flax (depthwise = conv with
feature_group_count, lowered to TPU depthwise convs; SE = global-pool +
two 1x1s; shift = a constant one-hot depthwise kernel), the same arch
tables as data, and an ``FBNetFasterRCNN`` that exposes the
backbone/rpn/roi_heads method surface of models.detector.FasterRCNN so
the compiled train/eval steps work unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .resnet import FrozenBatchNorm


def _divisible(v: int, divisor: int, min_val: int) -> int:
    """Round channels like the reference (_get_divisible_by)."""
    new_v = max(min_val, int(v + divisor / 2) // divisor * divisor)
    return new_v if new_v > 0 else int(v)


# ------------------------------------------------------------------ ops
class ConvBNRelu(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(
            self.out_channels, (k, k), strides=(self.stride, self.stride),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        # frozen-affine BN like the ResNet backbone (detection fine-tuning
        # freezes BN; keeps the whole param tree in the 'params' collection
        # so the compiled train step needs no mutable batch stats)
        x = FrozenBatchNorm(self.out_channels, self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class SEModule(nn.Module):
    """Squeeze-excite (fbnet_builder.py:397-412): global pool → 1x1 →
    relu → 1x1 → sigmoid gate."""

    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = max(self.channels // self.reduction, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                               name="fc2")(s))
        return x * s


def _channel_shuffle(x, groups: int):
    """ChannelShuffle (fbnet_builder.py:322-339)."""
    n, h, w, c = x.shape
    return (
        x.reshape(n, h, w, groups, c // groups)
        .transpose(0, 1, 2, 4, 3)
        .reshape(n, h, w, c)
    )


class IRFBlock(nn.Module):
    """Inverted residual (fbnet_builder.py:445-560): 1x1 expand →
    depthwise kxk → 1x1 linear project, residual when shapes match.
    Optional grouped pointwise + mid channel-shuffle ('shuffle' ops),
    squeeze-excite, and width rounding."""

    expansion: int
    out_channels: int
    stride: int = 1
    kernel: int = 3
    pw_group: int = 1
    shuffle_type: str | None = None
    se: bool = False
    width_divisor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = _divisible(cin * self.expansion, self.width_divisor,
                         self.width_divisor)
        h = x
        if self.expansion != 1 or self.pw_group > 1:
            h = ConvBNRelu(mid, kernel=1, groups=self.pw_group,
                           dtype=self.dtype, name="pw")(h, train=train)
        if self.shuffle_type == "mid" and self.pw_group > 1:
            h = _channel_shuffle(h, self.pw_group)
        h = ConvBNRelu(mid, kernel=self.kernel, stride=self.stride,
                       groups=mid, dtype=self.dtype, name="dw")(h, train=train)
        if self.se:
            h = SEModule(mid, dtype=self.dtype, name="se")(h)
        h = ConvBNRelu(self.out_channels, kernel=1, groups=self.pw_group,
                       relu=False, dtype=self.dtype, name="pwl")(h, train=train)
        if self.stride == 1 and cin == self.out_channels:
            h = h + x
        return h


class SkipBlock(nn.Module):
    """'skip' primitive (fbnet_builder.py Identity:195-218): identity, or
    a 1x1 conv when channels/stride change."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == self.out_channels and self.stride == 1:
            return x
        return ConvBNRelu(self.out_channels, kernel=1, stride=self.stride,
                          dtype=self.dtype, name="conv")(x, train=train)


class CascadeConv3x3(nn.Module):
    """'basic_block' primitive (fbnet_builder.py:221-238): two 3x3 convs
    with a residual when shapes match."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = self.stride == 1 and x.shape[-1] == self.out_channels
        h = ConvBNRelu(x.shape[-1], kernel=3, stride=self.stride,
                       dtype=self.dtype, name="conv1")(x, train=train)
        h = ConvBNRelu(self.out_channels, kernel=3, relu=False,
                       dtype=self.dtype, name="conv2")(h, train=train)
        return h + x if res else h


class Shift(nn.Module):
    """Zero-FLOP shift (fbnet_builder.py:241-292): a constant (non-learned)
    depthwise one-hot kernel that translates channel groups in the k*k
    directions."""

    kernel: int = 5
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        c = x.shape[-1]
        k, hks = self.kernel, self.kernel // 2
        ksq = k * k
        kernel = np.zeros((k, k, 1, c), np.float32)  # HWIO, depthwise
        ch = 0
        for i in range(k):
            for j in range(k):
                n = c // ksq + (c % ksq if (i == hks and j == hks) else 0)
                kernel[i, j, 0, ch : ch + n] = 1.0
                ch += n
        return lax.conv_general_dilated(
            x, jnp.asarray(kernel), (self.stride, self.stride),
            ((hks, hks), (hks, hks)), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ShiftBlock5x5(nn.Module):
    """'shift_5x5' primitive (fbnet_builder.py:295-319)."""

    expansion: int
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = _divisible(cin * self.expansion, 8, 8)
        h = ConvBNRelu(mid, kernel=1, dtype=self.dtype, name="pw")(x, train=train)
        h = Shift(5, self.stride, name="shift")(h)
        h = ConvBNRelu(self.out_channels, kernel=1, relu=False,
                       dtype=self.dtype, name="pwl")(h, train=train)
        if self.stride == 1 and cin == self.out_channels:
            h = h + x
        return h


def _primitive(op: str, expansion: int, out_channels: int, stride: int,
               name: str, dtype):
    """Op registry (fbnet_builder.py PRIMITIVES:37-193).  The _eN suffix
    overrides the table's expansion; _sN adds grouped-pw shuffle; _se adds
    squeeze-excite."""
    base = dict(out_channels=out_channels, stride=stride, name=name, dtype=dtype)
    if op == "skip":
        return SkipBlock(**base)
    if op == "basic_block":
        return CascadeConv3x3(**base)
    if op == "shift_5x5":
        return ShiftBlock5x5(expansion=expansion, **base)
    if op.startswith("ir_k"):
        parts = op.split("_")
        kernel = int(parts[1][1:])
        if kernel not in (1, 3, 5, 7):  # fbnet_builder.py IRFBlock:464
            raise ValueError(f"unknown FBNet primitive {op!r} (kernel {kernel})")
        exp, pw_group, shuffle, se = expansion, 1, None, False
        for p in parts[2:]:
            if p == "se":
                se = True
            elif p.startswith("e"):
                exp = int(p[1:])
            elif p.startswith("s"):
                pw_group, shuffle = int(p[1:]), "mid"
        return IRFBlock(expansion=exp, kernel=kernel, pw_group=pw_group,
                        shuffle_type=shuffle, se=se, **base)
    if op == "shuffle":
        return IRFBlock(expansion=expansion, shuffle_type="mid", pw_group=4,
                        **base)
    raise ValueError(f"unknown FBNet primitive {op!r}")


PRIMITIVES = (
    "skip", "basic_block", "shift_5x5", "shuffle",
    "ir_k1", "ir_k3", "ir_k5", "ir_k7",
    "ir_k3_e1", "ir_k3_e3", "ir_k3_e6", "ir_k3_s4",
    "ir_k5_e1", "ir_k5_e3", "ir_k5_e6", "ir_k5_s4",
    "ir_k3_e1_se", "ir_k3_e3_se", "ir_k3_e6_se",
    "ir_k5_e1_se", "ir_k5_e3_se", "ir_k5_e6_se",
)


# ------------------------------------------------------------- arch defs
# Reference format (fbnet_modeldef.py MODEL_ARCH): per-stage op lists +
# block cfgs [t, c, n, s], with named stage-index groups carving the op
# list into backbone / rpn / bbox / mask.
MODEL_ARCH = {
    "default": {
        "block_op_type": [
            ["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
            ["ir_k3"] * 4,  # bbox head
            ["ir_k3"] * 3,  # rpn
            ["ir_k3"] * 5,  # mask head
            ["ir_k3"] * 3,  # kpts head (repo extension, see group note)
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
                [[4, 160, 1, 2], [6, 160, 2, 1], [6, 240, 1, 1]],
                [[6, 96, 3, 1]],
                [[4, 160, 1, 1], [6, 160, 3, 1], [3, 80, 1, 1]],
                [[6, 96, 3, 1]],
            ],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
            "mask": [6],
            # repo extension: a keypoint head stage group.  No reference
            # arch table defines 'kpts'; the reference's fallback chain
            # (fbnet.py:156-162 _get_head_stage → get_blocks(None) keeps
            # EVERY stage) is degenerate, so we give the default arch a
            # real kpts stage instead (same shape as its rpn stage).
            "kpts": [7],
        },
    },
    "xirb16d_dsmask": {
        "block_op_type": [
            ["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
            ["ir_k3"] * 4, ["ir_k3"] * 5, ["ir_k3"] * 3,
        ],
        "block_cfg": {
            "first": [16, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 32, 2, 2]],
                [[6, 48, 3, 2]],
                [[6, 96, 4, 2], [6, 128, 3, 1]],
                [[4, 128, 1, 2], [6, 128, 2, 1], [6, 160, 1, 1]],
                [[4, 128, 1, 1], [6, 128, 3, 1], [3, 64, 1, 1]],
                [[6, 128, 3, 1]],
            ],
            "backbone": [0, 1, 2, 3],
            "rpn": [6],
            "bbox": [4],
            "mask": [5],
        },
    },
    "mobilenet_v2": {
        "block_op_type": [
            ["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
            ["ir_k3"] * 4,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
                [[6, 160, 3, 1], [6, 320, 1, 1]],
            ],
            "backbone": [0, 1, 2, 3],
            "bbox": [4],
        },
    },
    # ChamNet architectures (reference fbnet_modeldef.py:139-216 —
    # experiment constants reproduced in the reference's table format)
    "cham_v1a": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k7"] * 2,
            ["ir_k3"] * 5,
            ["ir_k5"] * 7 + ["ir_k3"] * 5,
            ["ir_k3"] * 5,  # bbox head
            ["ir_k3"] * 3,  # rpn
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 24, 1, 1]],
                [[4, 48, 2, 2]],
                [[7, 64, 5, 2]],
                [[12, 56, 7, 2], [8, 88, 5, 1]],
                [[7, 152, 4, 2], [10, 104, 1, 1]],
                [[8, 88, 3, 1]],
            ],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
        },
    },
    "cham_v2": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k5"] * 4,
            ["ir_k7"] * 6,
            ["ir_k5"] * 3 + ["ir_k3"] * 6,
            ["ir_k3"] * 7,  # bbox head
            ["ir_k3"] * 1,  # rpn
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 24, 1, 1]],
                [[8, 32, 4, 2]],
                [[5, 48, 6, 2]],
                [[9, 56, 3, 2], [6, 56, 6, 1]],
                [[2, 160, 6, 2], [6, 112, 1, 1]],
                [[6, 56, 1, 1]],
            ],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
        },
    },
    # op-diversity arch exercising the wider primitive set
    "chamnet_like": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k5_e3", "skip"],
            ["ir_k5_e6", "ir_k3_e3_se", "shuffle"],
            ["ir_k7", "basic_block", "ir_k5_s4", "ir_k3_e6"],
            ["ir_k5_e6", "shift_5x5"],
        ],
        "block_cfg": {
            "first": [16, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[3, 24, 2, 2]],
                [[6, 40, 3, 2]],
                [[6, 80, 4, 2]],
                [[6, 112, 2, 1]],
            ],
            "backbone": [0, 1, 2, 3],
            "bbox": [4],
        },
    },
}


def _expand_stage(arch: dict, stage_idx: int):
    """Expand one stage into a flat list of (op, expansion, channels,
    stride) block specs (fbnet_builder.py expand_stage_cfg + the repeat
    rule: stride applies to the first repeat only)."""
    ops = arch["block_op_type"][stage_idx]
    specs = []
    for t, c, n, s in arch["block_cfg"]["stages"][stage_idx]:
        for i in range(n):
            specs.append((c, t, s if i == 0 else 1))
    assert len(ops) == len(specs), (stage_idx, len(ops), len(specs))
    return [(op, t, c, s) for op, (c, t, s) in zip(ops, specs)]


def arch_stage_blocks(arch_name: str, group: str):
    """All block specs for a named stage group ('backbone'/'rpn'/'bbox'/
    'mask') of an arch table."""
    arch = MODEL_ARCH[arch_name]
    out = []
    for si in arch["block_cfg"].get(group, []):
        out.append(_expand_stage(arch, si))
    return out


class _BlockSeq(nn.Module):
    """Run a flat list of (op, t, c, s) primitive specs."""

    specs: tuple
    scale: float = 1.0
    width_divisor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for bi, (op, t, c, s) in enumerate(self.specs):
            c = _divisible(int(c * self.scale), self.width_divisor, 1)
            x = _primitive(op, t, c, s, name=f"block{bi}", dtype=self.dtype)(
                x, train=train
            )
        return x


class FBNetTrunk(nn.Module):
    """First conv + backbone stages (reference fbnet.py FBNetTrunk:34-53).

    ``arch`` may name a reference-format MODEL_ARCH table or a legacy
    simple table in ARCH_DEFS."""

    arch: str = "default"
    scale: float = 1.0
    width_divisor: int = 1
    stem_channels: int = 0  # 0 → arch's 'first' channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.arch in MODEL_ARCH:
            first_c, first_s = MODEL_ARCH[self.arch]["block_cfg"]["first"]
            stages = arch_stage_blocks(self.arch, "backbone")
        else:
            first_c, first_s = self.stem_channels or 16, 2
            stages = [
                [("ir_k%d" % k, t, c, s if i == 0 else 1)
                 for i in range(n)]
                for (t, c, n, s, k) in ARCH_DEFS[self.arch]
            ]
        first_c = _divisible(int(first_c * self.scale), self.width_divisor, 1)
        x = ConvBNRelu(first_c, kernel=3, stride=first_s, dtype=self.dtype,
                       name="stem")(x.astype(self.dtype), train=train)
        stage_outputs = []
        for si, specs in enumerate(stages):
            x = _BlockSeq(tuple(specs), self.scale, self.width_divisor,
                          self.dtype, name=f"stage{si}")(x, train=train)
            stage_outputs.append(x)
        return x, stage_outputs


# Legacy simple tables: (expansion, out_channels, num_blocks, stride, kernel)
ARCH_DEFS = {
    "xirb16d": (
        (1, 16, 1, 1, 3),
        (4, 24, 2, 2, 3),
        (4, 48, 3, 2, 3),
        (4, 96, 3, 2, 5),
    ),
    "mnv2": (
        (1, 16, 1, 1, 3),
        (6, 24, 2, 2, 3),
        (6, 32, 3, 2, 3),
        (6, 64, 4, 2, 3),
        (6, 96, 3, 1, 3),
        (6, 160, 3, 2, 3),
        (6, 320, 1, 1, 3),
    ),
}
# reference-format tables are also reachable through FBNetTrunk(arch=...)
ARCH_DEFS["default"] = tuple(
    (t, c, 1, s, 3)
    for st in arch_stage_blocks("default", "backbone")
    for (_, t, c, s) in st
)


# ------------------------------------------------------------- det heads
class FBNetRPNHead(nn.Module):
    """The arch's 'rpn' stage blocks + conv regressor (reference
    fbnet.py:121-158 FBNetRPNHead + RPNHeadConvRegressor)."""

    arch: str = "default"
    num_anchors: int = 15
    scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        specs = [s for st in arch_stage_blocks(self.arch, "rpn") for s in st]
        h = _BlockSeq(tuple(specs), self.scale, dtype=self.dtype,
                      name="tower")(features, train=train)
        logits = nn.Conv(self.num_anchors, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.dtype, name="cls_logits")(h)
        bbox = nn.Conv(self.num_anchors * 4, (1, 1),
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, name="bbox_pred")(h)
        return logits, bbox


class FBNetRoIBoxHead(nn.Module):
    """RoIAlign → the arch's 'bbox' stage blocks → global avg pool →
    cls/bbox predictors (reference fbnet.py:147-190 FBNetROIHead +
    the FastRCNNPredictor)."""

    num_classes: int
    arch: str = "default"
    pooler_resolution: int = 6
    pooler_scale: float = 1.0 / 16
    pooler_sampling_ratio: int = 0
    scale: float = 1.0
    # TPU.ROI_ALIGN_PRECISION (same knob as the C4/FPN families)
    roi_align_precision: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois, rois_valid=None, train: bool = False):
        import jax

        from ..ops.roi_align import roi_align

        b, s = rois.shape[:2]
        pool = jax.vmap(
            lambda f, r: roi_align(
                f, r, output_size=self.pooler_resolution,
                spatial_scale=self.pooler_scale,
                sampling_ratio=self.pooler_sampling_ratio,
                precision=self.roi_align_precision,
            )
        )(features, rois)
        roi_feats = pool
        x = pool.reshape((b * s,) + pool.shape[2:]).astype(self.dtype)
        specs = [sp for st in arch_stage_blocks(self.arch, "bbox") for sp in st]
        x = _BlockSeq(tuple(specs), self.scale, dtype=self.dtype,
                      name="tower")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        cls_logits = nn.Dense(self.num_classes,
                              kernel_init=nn.initializers.normal(0.01),
                              dtype=self.dtype, name="cls_score")(x)
        box_reg = nn.Dense(self.num_classes * 4,
                           kernel_init=nn.initializers.normal(0.001),
                           dtype=self.dtype, name="bbox_pred")(x)
        return (
            cls_logits.reshape(b, s, self.num_classes).astype(jnp.float32),
            box_reg.reshape(b, s, self.num_classes * 4).astype(jnp.float32),
            roi_feats,
            x.reshape(b, s, -1),
        )


class FBNetRoIMaskHead(nn.Module):
    """RoIAlign → the arch's 'mask' stage blocks → deconv mask predictor
    (reference fbnet.py:240-248 FBNet.roi_head_mask: an FBNetROIHead
    registered as the mask feature extractor, feeding the standard
    MaskRCNN predictor)."""

    num_classes: int
    arch: str = "default"
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16
    pooler_sampling_ratio: int = 0
    scale: float = 1.0
    roi_align_precision: str = "default"
    predictor_name: str = "MaskRCNNC4Predictor"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois, train: bool = False):
        import jax

        from ..ops.roi_align import roi_align
        from .mask_head import MaskRCNNC4Predictor, MaskRCNNConv1x1Predictor

        stage = arch_stage_blocks(self.arch, "mask")
        if not stage:
            raise ValueError(
                f"FBNet arch {self.arch!r} defines no 'mask' stage group "
                "(reference fbnet_modeldef.py: only mask-enabled archs do)"
            )
        b, s = rois.shape[:2]
        pool = jax.vmap(
            lambda f, r: roi_align(
                f, r, output_size=self.pooler_resolution,
                spatial_scale=self.pooler_scale,
                sampling_ratio=self.pooler_sampling_ratio,
                precision=self.roi_align_precision,
            )
        )(features, rois)
        x = pool.reshape((b * s,) + pool.shape[2:]).astype(self.dtype)
        specs = [sp for st in stage for sp in st]
        x = _BlockSeq(tuple(specs), self.scale, dtype=self.dtype,
                      name="tower")(x, train=train)
        preds = {"MaskRCNNC4Predictor": MaskRCNNC4Predictor,
                 "MaskRCNNConv1x1Predictor": MaskRCNNConv1x1Predictor}
        logits = preds[self.predictor_name](
            num_classes=self.num_classes, dtype=self.dtype, name="predictor"
        )(x)
        return logits.reshape((b, s) + logits.shape[1:])


class FBNetRoIKeypointHead(nn.Module):
    """RoIAlign → the arch's 'kpts' stage blocks → deconv keypoint
    predictor (reference fbnet.py:225-237 FBNet.roi_head_keypoints: an
    FBNetROIHead over the 'kpts' head stage — falling back to 'head' per
    _get_head_stage, fbnet.py:156-162 — registered as the keypoint
    feature extractor, feeding the standard KeypointRCNNPredictor)."""

    num_keypoints: int = 17
    arch: str = "default"
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16
    pooler_sampling_ratio: int = 0
    scale: float = 1.0
    roi_align_precision: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, rois, train: bool = False):
        import jax

        from ..ops.roi_align import roi_align
        from .keypoint_head import KeypointRCNNPredictor

        stage = arch_stage_blocks(self.arch, "kpts")
        if not stage:  # reference fallback: 'kpts' → 'head'
            stage = arch_stage_blocks(self.arch, "head")
        if not stage:
            raise ValueError(
                f"FBNet arch {self.arch!r} defines neither a 'kpts' nor a "
                "'head' stage group (reference fbnet.py:156-162 falls back "
                "to running the whole arch, which is never intended)"
            )
        b, s = rois.shape[:2]
        pool = jax.vmap(
            lambda f, r: roi_align(
                f, r, output_size=self.pooler_resolution,
                spatial_scale=self.pooler_scale,
                sampling_ratio=self.pooler_sampling_ratio,
                precision=self.roi_align_precision,
            )
        )(features, rois)
        x = pool.reshape((b * s,) + pool.shape[2:]).astype(self.dtype)
        specs = [sp for st in stage for sp in st]
        x = _BlockSeq(tuple(specs), self.scale, dtype=self.dtype,
                      name="tower")(x, train=train)
        heat = KeypointRCNNPredictor(
            num_keypoints=self.num_keypoints, dtype=self.dtype,
            name="predictor",
        )(x)
        return heat.reshape((b, s) + heat.shape[1:])


class FBNetFasterRCNN(nn.Module):
    """FBNet trunk + FBNet RPN + FBNet RoI box head with the same apply
    surface as models.detector.FasterRCNN (backbone/rpn/roi_heads), so
    engine.make_train_step / make_eval_step work unchanged.  The trunk's
    backbone stages end at stride 16 (first conv 2 + three stride-2
    stages), matching the C4 pooler scale."""

    num_classes: int
    arch: str = "default"
    num_anchors: int = 15
    scale: float = 1.0
    mask_on: bool = False
    mask_pooler_resolution: int = 14
    mask_predictor_name: str = "MaskRCNNC4Predictor"
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_pooler_resolution: int = 14
    roi_align_precision: str = "default"
    dtype: Any = jnp.float32

    def setup(self):
        self.trunk = FBNetTrunk(arch=self.arch, scale=self.scale,
                                dtype=self.dtype, name="backbone")
        self.rpn_head = FBNetRPNHead(arch=self.arch,
                                     num_anchors=self.num_anchors,
                                     scale=self.scale, dtype=self.dtype,
                                     name="rpn")
        self.box_head = FBNetRoIBoxHead(
            num_classes=self.num_classes, arch=self.arch, scale=self.scale,
            roi_align_precision=self.roi_align_precision,
            dtype=self.dtype, name="roi_heads")
        if self.mask_on:
            self.mask_head = FBNetRoIMaskHead(
                num_classes=self.num_classes, arch=self.arch,
                pooler_resolution=self.mask_pooler_resolution,
                scale=self.scale, predictor_name=self.mask_predictor_name,
                roi_align_precision=self.roi_align_precision,
                dtype=self.dtype, name="mask_heads_mod",
            )
        if self.keypoint_on:
            self.keypoint_head = FBNetRoIKeypointHead(
                num_keypoints=self.num_keypoints, arch=self.arch,
                pooler_resolution=self.keypoint_pooler_resolution,
                scale=self.scale,
                roi_align_precision=self.roi_align_precision,
                dtype=self.dtype, name="keypoint_heads_mod",
            )

    def backbone(self, pixels):
        c, stage_outputs = self.trunk(pixels)
        return c, stage_outputs

    def rpn(self, features):
        return self.rpn_head(features)

    def roi_heads(self, features, rois, rois_valid=None):
        return self.box_head(features, rois, rois_valid)

    def mask_heads(self, features, rois):
        """FBNet mask branch: its own pool + 'mask' blocks + predictor
        (the reference's non-shared mask feature extractor)."""
        if not self.mask_on:
            raise ValueError("model built without mask_on")
        return self.mask_head(features, rois)

    def keypoint_heads(self, features, rois):
        """FBNet keypoint branch: its own pool + 'kpts' blocks + deconv
        predictor (reference fbnet.py:225-237 FBNet.roi_head_keypoints)."""
        if not self.keypoint_on:
            raise ValueError("model built without keypoint_on")
        return self.keypoint_head(features, rois)

    def __call__(self, pixels, rois):
        features, _ = self.backbone(pixels)
        objectness, box_deltas = self.rpn(features)
        out = self.roi_heads(features, rois)
        if self.mask_on:
            out = out + (self.mask_heads(features, rois),)
        if self.keypoint_on:
            out = out + (self.keypoint_heads(features, rois),)
        return out


def build_fbnet_detector(cfg):
    """CONV_BODY 'FBNet' dispatch (reference backbone.py registry +
    fbnet.py add_conv_body / add_rpn_head / add_roi_head)."""
    fb = cfg.MODEL.FBNET
    num_anchors = len(tuple(cfg.MODEL.RPN.ANCHOR_SIZES)) * len(
        tuple(cfg.MODEL.RPN.ASPECT_RATIOS)
    )
    return FBNetFasterRCNN(
        num_classes=int(cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES),
        arch=str(fb.ARCH),
        num_anchors=num_anchors,
        scale=float(fb.SCALE_FACTOR),
        mask_on=bool(cfg.MODEL.MASK_ON),
        mask_pooler_resolution=int(cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION),
        mask_predictor_name=str(cfg.MODEL.ROI_MASK_HEAD.get(
            "PREDICTOR", "MaskRCNNC4Predictor")),
        keypoint_on=bool(cfg.MODEL.KEYPOINT_ON),
        num_keypoints=int(cfg.MODEL.ROI_KEYPOINT_HEAD.get("NUM_CLASSES", 17)),
        keypoint_pooler_resolution=int(
            cfg.MODEL.ROI_KEYPOINT_HEAD.get("POOLER_RESOLUTION", 14)),
        roi_align_precision=str(cfg.TPU.ROI_ALIGN_PRECISION),
        # same conv/matmul compute-dtype policy as the resnet families
        # (build.py:87); the fbnet xplane trace showed the whole trunk
        # running f32 convs before this was threaded through
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16,
               "float16": jnp.float16}[str(cfg.TPU.COMPUTE_DTYPE)],
    )
