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


def _sample_flagged(flag, key, k_max: int, num):
    """``num`` uniformly-random True slots of ``flag``: returns
    (mask [N], idx [k_max], sel [k_max]) where mask == scatter(sel at idx).

    Uses top-k over iid uniform keys — exactly uniform (any size-``num``
    subset of the flagged slots is equally likely, by exchangeability of
    continuous iid keys) and far cheaper than a full argsort when
    ``k_max << N`` (the RPN samples 256 of 65k anchors; the argsort
    formulation was ~4% of the train step).  Requires num <= k_max.
    """
    n = flag.shape[0]
    r = jax.random.uniform(key, (n,))
    score = jnp.where(flag, r, -1.0)
    _, idx = jax.lax.top_k(score, min(k_max, n))
    sel = jnp.arange(min(k_max, n)) < num  # flagged count >= num by construction
    return jnp.zeros((n,), bool).at[idx].set(sel, mode="drop"), idx, sel


def balanced_sample_masks(labels, key, batch_size: int, positive_fraction: float):
    """labels: [N] int (-1 ignore, 0 negative, >0 positive).

    Returns (pos_mask, neg_mask) [N] bool with
    |pos| = min(#pos, batch*frac), |neg| = min(#neg, batch - |pos|).
    """
    pos_mask, _, _, neg_mask = balanced_sample_with_indices(
        labels, key, batch_size, positive_fraction
    )
    return pos_mask, neg_mask


def balanced_sample_with_indices(labels, key, batch_size: int,
                                 positive_fraction: float):
    """Like balanced_sample_masks but also exposes the fixed-size positive
    index set (pos_idx [max_pos], pos_sel [max_pos]) so callers can gather
    positives instead of masking the full array (the RPN box loss only
    touches positives — no need to materialize per-anchor targets)."""
    kp, kn = jax.random.split(key)
    positive = labels >= 1
    negative = labels == 0
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(positive.astype(jnp.int32)), max_pos)
    num_neg = jnp.minimum(
        jnp.sum(negative.astype(jnp.int32)), batch_size - num_pos
    )
    pos_mask, pos_idx, pos_sel = _sample_flagged(positive, kp, max_pos, num_pos)
    neg_mask, _, _ = _sample_flagged(negative, kn, batch_size, num_neg)
    return pos_mask, pos_idx, pos_sel, neg_mask


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
