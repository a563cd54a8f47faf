"""ResNet backbone with frozen BatchNorm, NHWC, bf16-friendly.

TPU-native re-design of the reference backbone
(maskrcnn_benchmark/modeling/backbone/resnet.py): Caffe2-style
bottlenecks (stride in the first 1x1, reference defaults.py:303), frozen
batch-norm folded to a scale/bias affine (reference
layers/batch_norm.py), stem = 7x7/2 conv + maxpool 3x3/2.

``R-50-C4`` exposes the stage-3 (1024-ch, stride-16) feature map for the
RPN + RoI heads; ``Res5Head`` is the per-RoI stage-4 used as the box
head (reference roi_box_feature_extractors.py:13-55).  Stage freezing
(FREEZE_CONV_BODY_AT) is handled outside the module by an optimizer
mask — parameters, not module state, which is the idiomatic JAX shape
for "requires_grad=False".
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Constant-affine BN: y = x * scale + bias with frozen statistics.

    Parameters live in the ``params`` collection but must be masked out
    of the optimizer (see solver.optim.trainable_mask) — matching the
    reference where FrozenBatchNorm2d buffers never receive gradients.
    """

    features: int
    dtype: Any = jnp.float32
    weight_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", self.weight_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        running_mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        running_var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight / jnp.sqrt(running_var)
        shift = bias - running_mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def _conv(features, kernel, stride, name, dtype, use_bias=False, groups=1,
          dilation=1):
    pad = [(dilation * (k // 2), dilation * (k // 2)) for k in (kernel, kernel)]
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=pad,
        use_bias=use_bias,
        dtype=dtype,
        feature_group_count=groups,
        kernel_dilation=(dilation, dilation),
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        name=name,
    )


DEFAULT_GN = (32, -1, 1e-5)  # (NUM_GROUPS, DIM_PER_GP, EPSILON)


def _norm(kind: str, features: int, dtype, name: str, zero_init: bool = False,
          gn: tuple = DEFAULT_GN):
    """Reference TRANS_FUNC dispatch: FrozenBN (BottleneckWithFixedBatchNorm)
    or GroupNorm (BottleneckWithGN) built via the one GN factory
    (make_layers.group_norm — MODEL.GROUP_NORM.* keys flow through the
    ``gn`` tuple).  GN variants use gn* module names so the optimizer's
    frozen-BN mask (solver/optim.py FROZEN_BN_SEGMENTS) does NOT freeze
    them — GN params train in the reference."""
    if kind == "gn":
        from .make_layers import group_norm

        return group_norm(
            features, num_groups=int(gn[0]), dim_per_gp=int(gn[1]),
            epsilon=float(gn[2]), dtype=dtype,
            scale_init=nn.initializers.zeros if zero_init else None,
            name=name.replace("bn", "gn"),
        )
    return FrozenBatchNorm(
        features, dtype,
        weight_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
        name=name,
    )


class DFConv(nn.Module):
    """DFConv2d (reference layers/misc.py:114-203): a plain conv predicts
    per-tap offsets (and, for the modulated v2 variant, sigmoid masks);
    the deformable conv op (ops/deform_conv.py) consumes them.  Offsets
    compute in f32 — the bilinear gather is precision-sensitive."""

    features: int
    stride: int = 1
    modulated: bool = False
    deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import deform_conv2d

        if self.deformable_groups != 1:
            raise NotImplementedError(
                "deformable_groups > 1 is not supported (no reference config "
                "uses it; cfg.MODEL.RESNETS.DEFORMABLE_GROUPS=1)"
            )
        k = 3
        off_ch = k * k * (3 if self.modulated else 2)
        xf = x.astype(jnp.float32)
        om = nn.Conv(
            off_ch, (k, k), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=True,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"  # torch kaiming_uniform a=1
            ),
            name="offset",
        )(xf)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1], self.features),
        )
        if self.modulated:
            off = om[..., : 2 * k * k]
            mask = jax.nn.sigmoid(om[..., 2 * k * k :])
            y = deform_conv2d(xf, off, kernel, mask, stride=self.stride, padding=1)
        else:
            y = deform_conv2d(xf, om, kernel, stride=self.stride, padding=1)
        return y.astype(self.dtype)


class Bottleneck(nn.Module):
    """Caffe2-style bottleneck (stride_in_1x1=True); FrozenBN or GN per
    TRANS_FUNC (reference resnet.py:371-425), optional deformable conv2
    when the stage is in STAGE_WITH_DCN (reference resnet.py:289-303)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"  # 'frozen_bn' | 'gn'
    with_dcn: bool = False
    modulated_dcn: bool = False
    dcn_groups: int = 1
    groups: int = 1  # MODEL.RESNETS.NUM_GROUPS (ResNeXt)
    dilation: int = 1  # RES5_DILATION on the res5 head
    stride_in_1x1: bool = True  # MODEL.RESNETS.STRIDE_IN_1X1
    gn: tuple = DEFAULT_GN  # MODEL.GROUP_NORM.* when norm == 'gn'

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        # reference resnet.py:258-278: dilation > 1 resets the stride
        stride = 1 if self.dilation > 1 else self.stride
        s1, s3 = (stride, 1) if self.stride_in_1x1 else (1, stride)
        residual = x
        if in_channels != self.out_channels or self.stride != 1:
            residual = _conv(self.out_channels, 1, stride, "downsample_conv", self.dtype)(x)
            residual = _norm(self.norm, self.out_channels, self.dtype,
                             "downsample_bn", gn=self.gn)(residual)
        out = _conv(self.bottleneck_channels, 1, s1, "conv1", self.dtype)(x)
        out = _norm(self.norm, self.bottleneck_channels, self.dtype, "bn1", gn=self.gn)(out)
        out = nn.relu(out)
        if self.with_dcn:
            if self.groups != 1 or self.dilation != 1:
                raise NotImplementedError("DCN with groups/dilation is unsupported")
            out = DFConv(
                self.bottleneck_channels, stride=s3, modulated=self.modulated_dcn,
                deformable_groups=self.dcn_groups, dtype=self.dtype, name="conv2",
            )(out)
        else:
            out = _conv(self.bottleneck_channels, 3, s3, "conv2", self.dtype,
                        groups=self.groups, dilation=self.dilation)(out)
        out = _norm(self.norm, self.bottleneck_channels, self.dtype, "bn2", gn=self.gn)(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 1, 1, "conv3", self.dtype)(out)
        # zero-init the residual branch's last norm scale: keeps random-init
        # activations bounded through 50 frozen-BN layers (pretrained
        # weights overwrite this; the reference always loads ImageNet
        # weights so it never needed the guard)
        out = _norm(self.norm, self.out_channels, self.dtype, "bn3",
                    zero_init=True, gn=self.gn)(out)
        return nn.relu(out + residual)


class Stage(nn.Module):
    block_count: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int
    dtype: Any = jnp.float32
    scan_blocks: bool = False
    norm: str = "frozen_bn"
    with_dcn: bool = False
    modulated_dcn: bool = False
    dcn_groups: int = 1
    groups: int = 1
    dilation: int = 1
    stride_in_1x1: bool = True
    gn: tuple = DEFAULT_GN

    @nn.compact
    def __call__(self, x):
        kw = dict(norm=self.norm, with_dcn=self.with_dcn,
                  modulated_dcn=self.modulated_dcn, dcn_groups=self.dcn_groups,
                  groups=self.groups, dilation=self.dilation,
                  stride_in_1x1=self.stride_in_1x1, gn=self.gn)
        if not self.scan_blocks or self.block_count <= 2 or self.with_dcn:
            for i in range(self.block_count):
                x = Bottleneck(
                    self.bottleneck_channels,
                    self.out_channels,
                    stride=self.first_stride if i == 0 else 1,
                    dtype=self.dtype,
                    name=f"block{i}",
                    **kw,
                )(x)
            return x
        # HLO-size optimization: after block0, the remaining blocks are
        # shape-identical — run them as ONE scanned block with stacked
        # params.  Cuts compile time for deep stages; numerics identical.
        # (Param layout differs from the unscanned tree: stacked leaves
        # under "block_rest"; the weight converter handles both.)
        x = Bottleneck(
            self.bottleneck_channels,
            self.out_channels,
            stride=self.first_stride,
            dtype=self.dtype,
            name="block0",
            **kw,
        )(x)
        scanned = nn.scan(
            _BottleneckScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.block_count - 1,
        )(
            bottleneck_channels=self.bottleneck_channels,
            out_channels=self.out_channels,
            dtype=self.dtype,
            norm=self.norm,
            groups=self.groups,
            dilation=self.dilation,
            gn=self.gn,
            name="block_rest",
        )
        x, _ = scanned(x, None)
        return x


class _BottleneckScanBody(nn.Module):
    bottleneck_channels: int
    out_channels: int
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"
    groups: int = 1
    dilation: int = 1
    gn: tuple = DEFAULT_GN

    @nn.compact
    def __call__(self, carry, _):
        y = Bottleneck(
            self.bottleneck_channels, self.out_channels, stride=1,
            dtype=self.dtype, norm=self.norm, groups=self.groups,
            dilation=self.dilation, gn=self.gn, name="block",
        )(carry)
        return y, None


class _StemConvS2D(nn.Module):
    """The stem's 7x7/2 conv computed via space-to-depth.

    A 3-input-channel conv wastes the MXU (3 of 128 lanes); folding a 2x2
    pixel block into channels ([B,H,W,3] -> [B,H/2,W/2,12]) and applying
    the equivalent 4x4/1 kernel computes the IDENTICAL sum with 4x the
    lane utilization (the MLPerf-ResNet conv0 trick).  The parameter
    keeps the reference's [7,7,3,O] shape — checkpoints, the Caffe2/torch
    weight converter and the parity harness are unaffected:

        out[p,q,o] = sum_{ky,kx,c} k[ky,kx,c,o] * x[2p+ky-3, 2q+kx-3, c]
                   = sum_{m,n,dy,dx,c} k[2m+dy-1, 2n+dx-1, c, o]
                                       * z[p+m-2, q+n-2, (dy,dx,c)]
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (7, 7, 3, self.features),
        )
        b, h, w, c = x.shape
        z = x.reshape(b, h // 2, 2, w // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        kp = jnp.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))  # rows -1..7 -> 0..8
        w2 = kp[:8, :8].reshape(4, 2, 4, 2, c, self.features)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            z.astype(self.dtype),
            w2.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Stem(nn.Module):
    out_channels: int = 64
    dtype: Any = jnp.float32
    space_to_depth: bool = True
    norm: str = "frozen_bn"  # StemWithFixedBatchNorm | StemWithGN
    gn: tuple = DEFAULT_GN

    @nn.compact
    def __call__(self, x):
        if self.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _StemConvS2D(self.out_channels, self.dtype, name="conv1")(x)
        else:
            x = _conv(self.out_channels, 7, 2, "conv1", self.dtype)(x)
        x = _norm(self.norm, self.out_channels, self.dtype, "bn1", gn=self.gn)(x)
        x = nn.relu(x)
        # maxpool 3x3 stride 2 pad 1 (torch semantics)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


# (block_count per stage, R-50)
R50_STAGES = (3, 4, 6, 3)
R101_STAGES = (3, 4, 23, 3)


class ResNetC4(nn.Module):
    """Stem + stages 1-3 → [B, H/16, W/16, 1024] (reference R-50-C4).

    Returns (c4, backbone_features) like the reference ResNet.forward
    (resnet.py:145-155) — backbone_features are per-stage maps used by
    the `std` feature-distillation ablation.
    """

    stages: Sequence[int] = R50_STAGES[:3]
    width_per_group: int = 64
    res2_out_channels: int = 256
    dtype: Any = jnp.float32
    scan_blocks: bool = False
    # FREEZE_CONV_BODY_AT semantics (reference resnet.py:134-143 freezes
    # stem for freeze_at>=1 and layer{s} for s < freeze_at).  The
    # optimizer mask (solver/optim.py) already zeroes their updates; the
    # stop_gradient here additionally lets XLA dead-code-eliminate the
    # whole backward segment through the frozen prefix — the reference's
    # requires_grad=False skips that compute too.  Forward values are
    # untouched.
    freeze_at: int = 0
    freeze_all: bool = False  # MODEL.BACKBONE.FREEZE
    # TRANS_FUNC / STAGE_WITH_DCN (reference resnet.py:92,110-123)
    norm: str = "frozen_bn"
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    modulated_dcn: bool = False
    dcn_groups: int = 1
    num_groups: int = 1  # MODEL.RESNETS.NUM_GROUPS (ResNeXt)
    stride_in_1x1: bool = True  # MODEL.RESNETS.STRIDE_IN_1X1
    stem_out_channels: int = 64  # MODEL.RESNETS.STEM_OUT_CHANNELS
    gn: tuple = DEFAULT_GN  # MODEL.GROUP_NORM.*

    @nn.compact
    def __call__(self, x):
        x = Stem(out_channels=self.stem_out_channels, dtype=self.dtype,
                 norm=self.norm, gn=self.gn, name="stem")(x.astype(self.dtype))
        if self.freeze_all or self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        backbone_features = []
        for idx, block_count in enumerate(self.stages):
            factor = 2**idx
            x = Stage(
                block_count=block_count,
                bottleneck_channels=self.num_groups * self.width_per_group * factor,
                out_channels=self.res2_out_channels * factor,
                first_stride=1 if idx == 0 else 2,
                dtype=self.dtype,
                scan_blocks=self.scan_blocks,
                norm=self.norm,
                groups=self.num_groups,
                stride_in_1x1=self.stride_in_1x1,
                gn=self.gn,
                with_dcn=bool(self.stage_with_dcn[idx])
                if idx < len(self.stage_with_dcn) else False,
                modulated_dcn=self.modulated_dcn,
                dcn_groups=self.dcn_groups,
                name=f"layer{idx + 1}",
            )(x)
            if self.freeze_all or (idx + 1) < self.freeze_at:
                x = jax.lax.stop_gradient(x)
            backbone_features.append(x)
        return x, backbone_features


class Res5Head(nn.Module):
    """Stage-4 RoI head: [N, 7, 7, 1024] → [N, 4, 4, 2048]
    (reference ResNetHead, resnet.py:158-207; first stride 2)."""

    block_count: int = 3
    bottleneck_channels: int = 512
    out_channels: int = 2048
    dtype: Any = jnp.float32
    norm: str = "frozen_bn"
    with_dcn: bool = False  # STAGE_WITH_DCN[3] (reference dcn_config, resnet.py:220-234)
    modulated_dcn: bool = False
    dcn_groups: int = 1
    groups: int = 1
    dilation: int = 1  # MODEL.RESNETS.RES5_DILATION
    stride_in_1x1: bool = True
    gn: tuple = DEFAULT_GN

    @nn.compact
    def __call__(self, x):
        return Stage(
            block_count=self.block_count,
            bottleneck_channels=self.bottleneck_channels,
            out_channels=self.out_channels,
            first_stride=2,  # Bottleneck resets to 1 when dilation > 1
            dtype=self.dtype,
            norm=self.norm,
            with_dcn=self.with_dcn,
            modulated_dcn=self.modulated_dcn,
            dcn_groups=self.dcn_groups,
            groups=self.groups,
            dilation=self.dilation,
            stride_in_1x1=self.stride_in_1x1,
            gn=self.gn,
            name="layer4",
        )(x)
