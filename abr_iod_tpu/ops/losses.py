"""Elementwise loss ops.

These correspond to the reference's CUDA SigmoidFocalLoss kernel
(csrc/cuda/SigmoidFocalLoss_cuda.cu:20-120, CPU oracle at
layers/sigmoid_focal_loss.py:40-52) and smooth-L1
(layers/smooth_l1_loss.py).  Both are pure elementwise math that XLA
fuses into surrounding ops on TPU — a hand-written kernel would add
nothing, so plain jnp is the TPU-native implementation.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_loss(pred, target, beta: float = 1.0 / 9):
    """Per-element smooth L1 (reference: layers/smooth_l1_loss.py:9-16).

    Returns the elementwise loss; callers reduce with their own masks.
    """
    n = jnp.abs(pred - target)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def sigmoid_focal_loss(logits, targets, gamma: float = 2.0, alpha: float = 0.25):
    """Per-(box, class) focal loss.

    logits:  [N, K] raw class logits for classes 1..K
    targets: [N] int — 0 = background, -1 = ignore, c in 1..K = positive class
    Returns [N, K] elementwise losses
    (reference: layers/sigmoid_focal_loss.py:40-52 CPU oracle).
    """
    num_classes = logits.shape[-1]
    class_ids = jnp.arange(1, num_classes + 1, dtype=targets.dtype)[None, :]
    t = targets[:, None]
    p = 1.0 / (1.0 + jnp.exp(-logits))
    term1 = (1.0 - p) ** gamma * jnp.log(jnp.clip(p, 1e-12, None))
    term2 = p**gamma * jnp.log(jnp.clip(1.0 - p, 1e-12, None))
    pos = (t == class_ids).astype(logits.dtype)
    neg = ((t != class_ids) & (t >= 0)).astype(logits.dtype)
    return -pos * term1 * alpha - neg * term2 * (1.0 - alpha)
