"""RPN head (reference: maskrcnn_benchmark/modeling/rpn/rpn.py:70-129).

NHWC; outputs are kept in [B, H, W, A]/[B, H, W, 4A] layout, which when
flattened row-major gives exactly the (H, W, A) anchor order of
``anchors.grid_anchors`` (the reference reaches the same order through
permute_and_flatten, rpn/utils.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    num_anchors: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        in_channels = features.shape[-1]
        t = nn.Conv(
            in_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="conv",
        )(features)
        t = nn.relu(t)
        logits = nn.Conv(
            self.num_anchors,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_logits",
        )(t)
        bbox = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="bbox_pred",
        )(t)
        return logits, bbox


def flatten_rpn_outputs(objectness, box_regression):
    """[B,H,W,A], [B,H,W,4A] → [B, HWA], [B, HWA, 4] in anchor order."""
    b, h, w, a = objectness.shape
    obj = objectness.reshape(b, h * w * a)
    reg = box_regression.reshape(b, h * w, a, 4).reshape(b, h * w * a, 4)
    return obj, reg
