"""IoU matcher on padded arrays (reference: modeling/matcher.py:5-112).

Returns, per prediction, the index of the matched gt (argmax over gt of
IoU) or the sentinels BELOW_LOW_THRESHOLD (-1) / BETWEEN_THRESHOLDS (-2),
with optional low-quality-match recovery (ties included, matcher.py:85-112).

Static-shape semantics:
  * padded gt rows have IoU forced to 0 (never matched above thresholds)
  * an image with zero valid gt yields all-background matches — the
    reference *raises* in that case (matcher.py:53-62); masking is the
    correct TPU behavior and also fixes the reference's crash on
    empty-GT mosaics (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


class MatchResult(NamedTuple):
    matched_idx: jnp.ndarray  # [N] int32: gt index or -1/-2
    matched_gt: jnp.ndarray  # [N] int32: clamped gt index (always valid)
    matched_vals: jnp.ndarray  # [N] best IoU


def match(
    quality: jnp.ndarray,
    gt_mask: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
) -> MatchResult:
    """quality: [M_gt, N] (already zeroed on padded gt rows), gt_mask: [M_gt]."""
    q = jnp.where(gt_mask[:, None], quality, -1.0)  # padded gt never win argmax
    matched_vals = jnp.max(q, axis=0)
    matches = jnp.argmax(q, axis=0).astype(jnp.int32)

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        # for each gt, predictions tying its best IoU get their argmax match back
        best_per_gt = jnp.max(jnp.where(gt_mask[:, None], quality, -1.0), axis=1)
        is_best = (quality == best_per_gt[:, None]) & gt_mask[:, None]
        recover = jnp.any(is_best, axis=0)
        out = jnp.where(recover, matches, out)

    return MatchResult(out, jnp.maximum(matches, 0), matched_vals)


def take_matched_rows(table: jnp.ndarray, idx: jnp.ndarray,
                      backend: str | None = None) -> jnp.ndarray:
    """``table[idx]`` — row-gather of a small gt table ([M,K]) by a large
    per-anchor index vector ([N] int32 in [0,M)) — realized as a one-hot
    contraction on the MXU.

    At RetinaNet's dense-anchor scale (8 x 209k indices into a 64-row
    table per step) XLA lowers the native gather to serial scalar-indexed
    fusions measured at ~16 ms/step on TPU v5e (xplane, BASELINE.md
    round 5); the equivalent ``onehot(idx) @ table`` streams through the
    matmul unit instead.  Every one-hot row holds exactly one nonzero,
    so each output element is a single ``1.0 * value`` product —
    ``Precision.HIGHEST`` (the f32 multi-pass decomposition) reproduces
    the gathered f32 values exactly; integer payloads up to 2**24 are
    likewise exact through f32.  ``ABR_TAKE_MATCHED=gather`` (or
    backend='gather') forces the native gather for A/B.
    """
    if backend is None:
        backend = os.environ.get("ABR_TAKE_MATCHED", "onehot")
    if backend == "gather":
        return table[idx]
    m = table.shape[0]
    onehot = (idx[:, None] == jnp.arange(m, dtype=idx.dtype)[None, :]).astype(
        table.dtype)
    return jax.lax.dot(onehot, table, precision=jax.lax.Precision.HIGHEST)
