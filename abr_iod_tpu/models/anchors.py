"""Anchor generation (static, precomputed per feature-map shape).

Mirrors the Detectron anchor math of the reference
(maskrcnn_benchmark/modeling/rpn/anchor_generator.py:34-138 and the
generate_anchors block at the bottom of that file), including the
integer rounding in the ratio enumeration — bit-exact parity matters
because anchors feed every downstream coordinate.

Unlike the reference (which regenerates per batch from runtime feature
shapes), anchors here are a compile-time constant for the padded canvas:
one [H*W*A, 4] array in (h, w, a) order, matching permute_and_flatten's
(H, W, A) layout of the RPN head outputs.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def cell_anchors(
    stride: int = 16,
    sizes: tuple = (32, 64, 128, 256, 512),
    aspect_ratios: tuple = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """[A, 4] base anchors around the (0,0) cell, Detectron rounding."""
    base = np.array([1, 1, stride, stride], dtype=np.float64) - 1
    scales = np.array(sizes, dtype=np.float64) / stride
    ratios = np.array(aspect_ratios, dtype=np.float64)

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, x_ctr, y_ctr):
        ws = ws[:, None]
        hs = hs[:, None]
        return np.hstack(
            (
                x_ctr - 0.5 * (ws - 1),
                y_ctr - 0.5 * (hs - 1),
                x_ctr + 0.5 * (ws - 1),
                y_ctr + 0.5 * (hs - 1),
            )
        )

    w, h, x_ctr, y_ctr = whctrs(base)
    size_ratios = w * h / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = mkanchors(ws, hs, x_ctr, y_ctr)

    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = whctrs(ratio_anchors[i])
        out.append(mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    # reference order: ratios vary slowest? _ratio_enum then per-ratio scales
    # stacked with vstack → (ratio, scale) — BUT note the reference's
    # generate_anchors passes sizes/stride as `scales`, enumerating
    # (ratio-major, scale-minor). The RPN head's A channels must match.
    return np.vstack(out).astype(np.float32)


@functools.lru_cache(maxsize=None)
def grid_anchors(
    feat_h: int,
    feat_w: int,
    stride: int = 16,
    sizes: tuple = (32, 64, 128, 256, 512),
    aspect_ratios: tuple = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """[feat_h * feat_w * A, 4] anchors in (h, w, a) order."""
    cell = cell_anchors(stride, sizes, aspect_ratios)  # [A, 4]
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # [H, W]
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [HW, 1, 4]
    return (shifts + cell[None]).reshape(-1, 4)


@functools.lru_cache(maxsize=32)
def _grid_anchors_cached(feat_h, feat_w, stride, sizes, aspect_ratios):
    return grid_anchors(feat_h, feat_w, stride, sizes, aspect_ratios)


def anchors_for_shape(cfg, canvas_h: int, canvas_w: int, stride: int = 16):
    """Anchors for a (possibly transposed) static canvas, computed at trace
    time from the batch's pixel shape — each orientation's compiled program
    gets its own constant-folded anchor grid (dual-orientation canvases,
    data/loader.py)."""
    import jax.numpy as jnp

    return jnp.asarray(
        _grid_anchors_cached(
            canvas_h // stride, canvas_w // stride, stride,
            tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
        )
    )


def anchor_visibility(anchors: np.ndarray, image_h, image_w, straddle_thresh: float = 0):
    """Straddle visibility flags (reference: anchor_generator.py:97-111).

    image_h/image_w may be traced arrays (per-image valid sizes).
    """
    import jax.numpy as jnp

    a = anchors
    return (
        (a[..., 0] >= -straddle_thresh)
        & (a[..., 1] >= -straddle_thresh)
        & (a[..., 2] < image_w + straddle_thresh)
        & (a[..., 3] < image_h + straddle_thresh)
    )


NUM_CELL_ANCHORS = 15  # 5 sizes x 3 ratios for the shipped VOC configs
