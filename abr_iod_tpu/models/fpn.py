"""Feature Pyramid Network (reference: modeling/backbone/fpn.py:7-99).

Top-down pathway with lateral 1x1 connections and 3x3 output convs over
the C2..C5 maps, plus the extra-level blocks:
  * LastLevelMaxPool  — stride-2 maxpool P6 (Faster/Mask R-CNN FPN)
  * LastLevelP6P7     — convs on C5 for RetinaNet (fpn.py:80-99)

NHWC; upsampling is nearest-neighbor like the reference's
F.interpolate(scale_factor=2, mode='nearest').
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    out_channels: int = 256
    top_block: str = "maxpool"  # 'maxpool' | 'p6p7' | 'none'
    dtype: Any = jnp.float32
    # MODEL.FPN.USE_GN / USE_RELU (reference make_layers.py conv_with_kaiming_
    # uniform — GN + ReLU wrap the lateral/output convs when enabled)
    use_gn: bool = False
    use_relu: bool = False
    gn: tuple = (32, -1, 1e-5)  # MODEL.GROUP_NORM.*

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """features: [C2, C3, C4, C5] NHWC → [P2, P3, P4, P5, (P6, P7)]."""
        n = len(features)

        def block(x, kernel, name):
            pad = kernel // 2
            y = nn.Conv(self.out_channels, (kernel, kernel),
                        padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                        use_bias=not self.use_gn,
                        kernel_init=nn.initializers.kaiming_uniform(),
                        name=name)(x)
            if self.use_gn:
                from .make_layers import group_norm

                y = group_norm(
                    self.out_channels, num_groups=int(self.gn[0]),
                    dim_per_gp=int(self.gn[1]), epsilon=float(self.gn[2]),
                    dtype=self.dtype, name=f"{name}_gn",
                )(y)
            if self.use_relu:
                y = nn.relu(y)
            return y

        laterals = [
            block(f, 1, f"fpn_inner{i + 1}") for i, f in enumerate(features)
        ]
        outs = [None] * n
        last = laterals[-1]
        outs[-1] = block(last, 3, f"fpn_layer{n}")
        for i in range(n - 2, -1, -1):
            up = jax.image.resize(
                last, laterals[i].shape, method="nearest"
            )
            last = laterals[i] + up
            outs[i] = block(last, 3, f"fpn_layer{i + 1}")

        if self.top_block == "maxpool":
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        elif self.top_block == "p6p7":
            p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="p6")(features[-1])
            p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="p7")(nn.relu(p6))
            outs.extend([p6, p7])
        return outs


def fpn_level_mapper(rois: jnp.ndarray, k_min: int = 2, k_max: int = 5,
                     canonical_scale: int = 224, canonical_level: int = 4):
    """FPN level assignment (reference: modeling/poolers.py LevelMapper —
    Eqn.1 of the FPN paper). rois [R,4] → level index in [0, k_max-k_min]."""
    from ..structures.boxes import box_area

    s = jnp.sqrt(box_area(rois))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def fpn_roi_align(features: Sequence[jnp.ndarray], rois: jnp.ndarray,
                  output_size: int = 7, scales=(0.25, 0.125, 0.0625, 0.03125),
                  sampling_ratio: int = 2, precision: str = "highest",
                  backend: str = "default"):
    """Multi-level RoIAlign, single image (reference: modeling/poolers.py
    Pooler for FPN).  Realizations (TPU.FPN_ROI_ALIGN_BACKEND):
      * 'einsum' — pool every RoI from every level with the dense
        interpolation-matrix contraction (ops/roi_align.py), select by
        level assignment with a static 4-way where.  4x pooling cost and
        the einsum cost scales with map area — on the 208x336 P2 map the
        matrices are ~99.5% zeros (measured ~35% of the FPN train step).
      * 'gather' — each RoI gathers its P*P*g*g*4 bilinear taps from its
        ASSIGNED level only (the reference's per-level index_select
        structure), cost independent of map area
        (ops/roi_align.py multilevel_roi_align_gather).  Measured 32%
        SLOWER than einsum on the full TPU FPN step (XLA row
        gathers/scatters ~40 GB/s, BASELINE.md round 5) — kept as a
        tested alternative for hardware where gathers are fast.
      * 'sorted' — batched-only; see fpn_roi_align_batched.
    'default' resolves to 'einsum' here; the batched entry point resolves
    it to 'sorted' (the conditional level skip needs batch-uniform
    predicates, impossible under per-image vmap).
    """
    from ..ops.roi_align import (
        multilevel_roi_align_einsum,
        multilevel_roi_align_gather,
    )

    if backend == "default":
        backend = "einsum"
    lvl = fpn_level_mapper(rois)
    if backend == "gather":
        # positional: custom_vjp + nondiff_argnums rejects kwargs
        return multilevel_roi_align_gather(
            list(features), rois, lvl, output_size, tuple(scales),
            sampling_ratio, precision,
        )
    if backend != "einsum":
        raise ValueError(f"unknown FPN RoIAlign backend {backend!r}")
    return multilevel_roi_align_einsum(
        list(features), rois, lvl, output_size=output_size,
        scales=tuple(scales), sampling_ratio=sampling_ratio,
        precision=precision,
    )


def fpn_roi_align_batched(features: Sequence[jnp.ndarray], rois: jnp.ndarray,
                          output_size: int = 7,
                          scales=(0.25, 0.125, 0.0625, 0.03125),
                          sampling_ratio: int = 2, precision: str = "highest",
                          backend: str = "default"):
    """Batched multi-level RoIAlign: features list of [B,h,w,C], rois
    [B,S,4] → [B,S,P,P,C].  This is the entry the FPN heads use.

    'default' resolves to 'sorted' for static sampling ratios —
    ops/roi_align.py multilevel_roi_align_sorted: stable-sort RoIs by
    assigned level, then one batch-uniform `lax.cond` per (chunk, level)
    pair so only the assigned-level einsums execute (typically ~1/3 of
    the plain einsum work, worst case equal; values match to float
    rounding, tests/test_fpn_gather.py).  The adaptive ratio-0 grid and
    the explicit 'einsum'/'gather' backends run per image under vmap.
    """
    if backend == "default":
        backend = "sorted" if sampling_ratio >= 1 else "einsum"
    if backend == "sorted":
        from ..ops.roi_align import multilevel_roi_align_sorted

        lvl = fpn_level_mapper(rois)
        return multilevel_roi_align_sorted(
            list(features), rois, lvl, output_size=output_size,
            scales=tuple(scales), sampling_ratio=sampling_ratio,
            precision=precision,
        )
    fn = lambda fs, r: fpn_roi_align(
        fs, r, output_size=output_size, scales=tuple(scales),
        sampling_ratio=sampling_ratio, precision=precision, backend=backend,
    )
    return jax.vmap(fn, in_axes=(0, 0))(list(features), rois)
