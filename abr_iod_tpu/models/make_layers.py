"""Layer factory helpers (reference: modeling/make_layers.py — GN helper,
kaiming conv/fc factories used by FPN/Xconv heads)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def gn_num_groups(features: int, num_groups: int = 32, dim_per_gp: int = -1) -> int:
    """Group count per the reference rule (make_layers.py get_group_gn:
    DIM_PER_GP > 0 wins, else NUM_GROUPS).

    The reference asserts divisibility (``dim % dim_per_gp == 0`` /
    ``dim % num_groups == 0``); so do we for realistic channel counts —
    a misconfigured model must fail, not silently train with different
    groups.  Only the tiny-channel test regime (features < the requested
    group count, impossible under the reference's assert too) degrades to
    the largest divisor so shrunken unit-test models still build."""
    import math

    if dim_per_gp > 0:
        if features % dim_per_gp != 0:
            raise ValueError(
                f"GROUP_NORM.DIM_PER_GP={dim_per_gp} does not divide "
                f"{features} channels (reference make_layers.py asserts this)"
            )
        return features // dim_per_gp
    if features < num_groups:
        return math.gcd(num_groups, features)
    if features % num_groups != 0:
        raise ValueError(
            f"GROUP_NORM.NUM_GROUPS={num_groups} does not divide "
            f"{features} channels (reference make_layers.py asserts this)"
        )
    return num_groups


def group_norm(features: int | None = None, num_groups: int = 32,
               epsilon: float = 1e-5, dim_per_gp: int = -1,
               dtype: Any = jnp.float32, name: str | None = None,
               scale_init=None):
    """GroupNorm module factory (reference make_layers.py group_norm:
    cfg.MODEL.GROUP_NORM.{NUM_GROUPS,DIM_PER_GP,EPSILON}).  Every GN in
    the tree is built here so the GROUP_NORM config keys have ONE home."""
    groups = (
        gn_num_groups(features, num_groups, dim_per_gp)
        if features is not None else num_groups
    )
    kwargs = {}
    if scale_init is not None:
        kwargs["scale_init"] = scale_init
    return nn.GroupNorm(
        num_groups=groups, epsilon=epsilon, dtype=dtype, name=name, **kwargs
    )


def make_conv3x3(out_channels: int, dilation: int = 1, stride: int = 1,
                 use_gn: bool = False, use_relu: bool = False,
                 kaiming_init: bool = True, dtype: Any = jnp.float32):
    """3x3 conv (+ optional GN + ReLU) factory (make_layers.py make_conv3x3)."""
    init = (
        nn.initializers.kaiming_normal()
        if kaiming_init
        else nn.initializers.normal(0.01)
    )

    def conv_factory():
        return nn.Conv(
            out_channels, (3, 3), strides=(stride, stride),
            padding=((dilation, dilation), (dilation, dilation)),
            kernel_dilation=(dilation, dilation),
            use_bias=not use_gn, kernel_init=init, dtype=dtype,
        )

    if not (use_gn or use_relu):
        return conv_factory()

    class _Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = conv_factory()(x)
            if use_gn:
                y = group_norm(out_channels, dtype=dtype)(y)
            if use_relu:
                y = nn.relu(y)
            return y

    return _Block()


def make_fc(out_features: int, use_gn: bool = False, dtype: Any = jnp.float32):
    """FC factory with caffe2 XavierFill-equivalent init (make_layers.py
    make_fc)."""
    return nn.Dense(
        out_features, use_bias=not use_gn,
        kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
        dtype=dtype,
    )
