"""FBNet mobile backbone family.

Reference: modeling/backbone/{fbnet,fbnet_builder,fbnet_modeldef}.py
(~1.3 kLoC) — a builder over inverted-residual (IRF) blocks driven by
arch-definition tables, registered as backbones/heads but unused by the
shipped ABR configs.  This is the TPU-native equivalent: the same IRF
block algebra (1x1 expand → depthwise kxk → 1x1 linear project, residual
skip when shapes match) in flax, with representative arch definitions;
additional archs are one table entry each.

Depthwise convolutions map to flax's feature_group_count — lowered by
XLA to TPU depthwise convs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# stage spec: (expansion, out_channels, num_blocks, stride, kernel)
ARCH_DEFS = {
    # reference fbnet_modeldef "default" — mobilenetv2-like trunk
    "default": (
        (1, 16, 1, 1, 3),
        (6, 24, 2, 2, 3),
        (6, 32, 3, 2, 5),
        (6, 64, 4, 2, 5),
        (6, 96, 3, 1, 5),
        (6, 160, 3, 2, 5),
        (6, 320, 1, 1, 3),
    ),
    # small variant for detection heads / tests
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


class IRFBlock(nn.Module):
    """Inverted residual (fbnet_builder.py IRFBlock)."""

    expansion: int
    out_channels: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expansion
        h = x
        if self.expansion != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="pw_bn")(h)
            h = nn.relu(h)
        k = self.kernel
        h = nn.Conv(
            mid, (k, k), strides=(self.stride, self.stride),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            feature_group_count=mid, use_bias=False, dtype=self.dtype, name="dw",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="dw_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwl")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="pwl_bn")(h)
        if self.stride == 1 and cin == self.out_channels:
            h = h + x
        return h


class FBNetTrunk(nn.Module):
    arch: str = "default"
    stem_channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="stem")(x.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        stage_outputs = []
        for si, (exp, c, n, s, k) in enumerate(ARCH_DEFS[self.arch]):
            for bi in range(n):
                x = IRFBlock(
                    expansion=exp, out_channels=c,
                    stride=s if bi == 0 else 1, kernel=k, dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train=train)
            stage_outputs.append(x)
        return x, stage_outputs
