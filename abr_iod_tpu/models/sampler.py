"""Balanced positive/negative sampling with static shapes.

Reference: modeling/balanced_positive_negative_sampler.py:5-77 —
randomly keep up to ``batch * positive_fraction`` positives and fill the
rest with negatives.  The reference materializes ragged index tensors;
here everything is fixed-size masks and (for the RoI head) a fixed-size
gather index vector so downstream pooling has a static shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _rank_by_random(flag: jnp.ndarray, key) -> jnp.ndarray:
    """Random strict ranking within `flag` slots: 0..k-1 for the k True
    slots in uniformly random order; large values elsewhere."""
    n = flag.shape[0]
    r = jax.random.uniform(key, (n,))
    score = jnp.where(flag, r, 2.0 + jnp.arange(n) / n)  # non-flag sink to end
    order = jnp.argsort(score)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(flag, rank, n)


def balanced_sample_masks(labels, key, batch_size: int, positive_fraction: float):
    """labels: [N] int (-1 ignore, 0 negative, >0 positive).

    Returns (pos_mask, neg_mask) [N] bool with
    |pos| = min(#pos, batch*frac), |neg| = min(#neg, batch - |pos|).
    """
    kp, kn = jax.random.split(key)
    positive = labels >= 1
    negative = labels == 0
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(positive.astype(jnp.int32)), max_pos)
    num_neg = jnp.minimum(
        jnp.sum(negative.astype(jnp.int32)), batch_size - num_pos
    )
    pos_rank = _rank_by_random(positive, kp)
    neg_rank = _rank_by_random(negative, kn)
    return pos_rank < num_pos, neg_rank < num_neg


class RoiSample(NamedTuple):
    idx: jnp.ndarray  # [S] int32 gather indices into the proposal array
    valid: jnp.ndarray  # [S] bool — slot holds a sampled proposal
    is_pos: jnp.ndarray  # [S] bool


def balanced_sample_indices(labels, key, batch_size: int, positive_fraction: float):
    """Like balanced_sample_masks but returns a FIXED-SIZE index vector of
    exactly ``batch_size`` slots (positives first), for static-shape RoI
    gathering.  Padding slots point at index 0 with valid=False.
    """
    pos_mask, neg_mask = balanced_sample_masks(labels, key, batch_size, positive_fraction)
    n = labels.shape[0]
    num_pos = jnp.sum(pos_mask.astype(jnp.int32))
    num_sel = num_pos + jnp.sum(neg_mask.astype(jnp.int32))
    # order: positives (rank 0..num_pos-1) then negatives
    pos_rank = jnp.where(pos_mask, jnp.cumsum(pos_mask.astype(jnp.int32)) - 1, n)
    neg_rank = jnp.where(
        neg_mask, num_pos + jnp.cumsum(neg_mask.astype(jnp.int32)) - 1, n
    )
    slot = jnp.where(pos_mask, pos_rank, jnp.where(neg_mask, neg_rank, n))
    # scatter proposal index into its slot; out-of-range slots are dropped
    idx = jnp.zeros((batch_size,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    arange = jnp.arange(batch_size)
    return RoiSample(idx=idx, valid=arange < num_sel, is_pos=arange < num_pos)
