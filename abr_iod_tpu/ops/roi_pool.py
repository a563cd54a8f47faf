"""RoIPool (max pooling) with exact reference semantics.

Reference: csrc/cuda/ROIPool_cuda.cu:16-77 — rounded roi coordinates,
roi_width = max(end - start + 1, 1), per-bin [floor(ph*bin), ceil((ph+1)
*bin)) ranges clipped to the map, empty bins = 0.

TPU shape: instead of a gather kernel, each bin is a masked max — the
membership masks M_y[r, ph, h] / M_x[r, pw, w] are rank-1 per axis, so
the masked max factorizes into two cheap axis reductions (max over h,
then max over w).  Differentiable (max-backward == argmax scatter, which
matches the CUDA backward's argmax semantics up to tie-breaking).

Unused by the shipped ABR configs (they use RoIAlign) but part of the
reference's op surface (layers/roi_pool.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -3.4e38


def _bin_masks(start, size_px, feat_size: int, pooled: int):
    """Membership masks [R, pooled, feat_size] for one axis."""
    bin_sz = size_px / pooled  # [R]
    p = jnp.arange(pooled, dtype=jnp.float32)
    lo = jnp.floor(p[None, :] * bin_sz[:, None]) + start[:, None]
    hi = jnp.ceil((p[None, :] + 1.0) * bin_sz[:, None]) + start[:, None]
    lo = jnp.clip(lo, 0, feat_size)
    hi = jnp.clip(hi, 0, feat_size)
    cells = jnp.arange(feat_size, dtype=jnp.float32)[None, None, :]
    return (cells >= lo[..., None]) & (cells < hi[..., None])  # [R, P, F]


def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
) -> jnp.ndarray:
    """features [H, W, C], rois [R, 4] → [R, P, P, C]."""
    h, w, c = features.shape
    start_w = jnp.round(rois[:, 0] * spatial_scale)
    start_h = jnp.round(rois[:, 1] * spatial_scale)
    end_w = jnp.round(rois[:, 2] * spatial_scale)
    end_h = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)

    m_y = _bin_masks(start_h, roi_h, h, output_size)  # [R, P, H]
    m_x = _bin_masks(start_w, roi_w, w, output_size)  # [R, P, W]

    def per_roi(args):
        my, mx = args
        # stage 1: masked max over h → [P, W, C]
        t = jnp.where(my[:, :, None, None], features[None], NEG).max(axis=1)
        # stage 2: masked max over w → [pw, ph, C] → [ph, pw, C]
        o = jnp.where(mx[:, None, :, None], t[None], NEG).max(axis=2)
        o = jnp.swapaxes(o, 0, 1)
        # empty bins → 0 (cuda:61-62)
        empty = (~jnp.any(my, axis=1))[:, None, None] | (~jnp.any(mx, axis=1))[None, :, None]
        return jnp.where(empty, 0.0, o)

    # lax.map (not vmap) keeps the [P,H,W,C] masked intermediate per-RoI
    # instead of materializing it for all RoIs at once
    return jax.lax.map(per_roi, (m_y, m_x))


def roi_pool_batched(features, rois, output_size: int = 7, spatial_scale: float = 1.0 / 16):
    fn = functools.partial(roi_pool, output_size=output_size, spatial_scale=spatial_scale)
    return jax.vmap(fn)(features, rois)
