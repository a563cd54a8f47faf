"""Segmentation mask utilities on fixed-shape arrays.

Replaces the reference's SegmentationMask / PolygonInstance zoo
(structures/segmentation_mask.py:33-545) with two representations:
  * host side: polygon lists rasterized to binary numpy masks
  * device side: padded binary masks [M, mh, mw] + validity

``crop_and_resize_masks`` reproduces project_masks_on_boxes semantics
(roi_heads/mask_head/loss.py:11-42): crop each gt mask to its matched
proposal box and resize to the discretization size — here as a
jit-compatible bilinear resample.  ``paste_masks_in_image`` is the
Masker paste-back (mask_head/inference.py:12-200, threshold 0.5).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def polygons_to_mask(polygons: Sequence[Sequence[float]], height: int, width: int) -> np.ndarray:
    """Rasterize COCO-style polygon lists to a binary mask (host side)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (width, height), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, dtype=bool)


def crop_and_resize_masks(masks, boxes, out_size: int):
    """masks [N, H, W] (bool/float), boxes [N, 4] xyxy → [N, M, M] float
    in [0,1] — project_masks_on_boxes equivalent, device-compatible."""
    import jax
    import jax.numpy as jnp

    def one(mask, box):
        h, w = mask.shape
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        # sample an out_size x out_size grid inside the box (align corners)
        ys = y1 + (jnp.arange(out_size) + 0.5) / out_size * bh
        xs = x1 + (jnp.arange(out_size) + 0.5) / out_size * bw
        y0 = jnp.clip(jnp.floor(ys - 0.5), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs - 0.5), 0, w - 1)
        fy = jnp.clip(ys - 0.5 - y0, 0.0, 1.0)
        fx = jnp.clip(xs - 0.5 - x0, 0.0, 1.0)
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        m = mask.astype(jnp.float32)
        v00 = m[y0[:, None], x0[None, :]]
        v01 = m[y0[:, None], x1i[None, :]]
        v10 = m[y1i[:, None], x0[None, :]]
        v11 = m[y1i[:, None], x1i[None, :]]
        top = v00 * (1 - fx)[None, :] + v01 * fx[None, :]
        bot = v10 * (1 - fx)[None, :] + v11 * fx[None, :]
        return top * (1 - fy)[:, None] + bot * fy[:, None]

    return jax.vmap(one)(masks, boxes)


def _bilinear_resize_np(src: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Half-pixel bilinear resize (torch F.interpolate mode='bilinear',
    align_corners=False, no antialiasing): output center (i+.5) maps to
    source (i+.5)*s-.5, edge-clamped.  PIL's BILINEAR antialiases on
    downscale, which the reference's interpolate does NOT — so the resize
    is restated here rather than delegated to PIL."""
    sh, sw = src.shape
    ys = (np.arange(th, dtype=np.float64) + 0.5) * (sh / th) - 0.5
    xs = (np.arange(tw, dtype=np.float64) + 0.5) * (sw / tw) - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    fy = (ys - y0).astype(np.float32)
    fx = (xs - x0).astype(np.float32)
    y0c, y1c = np.clip(y0, 0, sh - 1), np.clip(y0 + 1, 0, sh - 1)
    x0c, x1c = np.clip(x0, 0, sw - 1), np.clip(x0 + 1, 0, sw - 1)
    top = src[np.ix_(y0c, x0c)] * (1 - fx) + src[np.ix_(y0c, x1c)] * fx
    bot = src[np.ix_(y1c, x0c)] * (1 - fx) + src[np.ix_(y1c, x1c)] * fx
    return top * (1 - fy)[:, None] + bot * fy[:, None]


def paste_masks_in_image(mask_probs: np.ndarray, boxes: np.ndarray,
                         image_hw: Tuple[int, int], threshold: float = 0.5,
                         padding: int = 1) -> np.ndarray:
    """Masker restated EXACTLY (host side): paste [N, M, M] probabilities
    into binary image masks [N, H, W] per mask_head/inference.py:119-160 —
    expand the mask by `padding`, expand the box by (M+2p)/M, cast the
    expanded box to int32 (truncation toward zero, the reference's
    `.to(dtype=torch.int32)` quirk), resize the padded mask to
    (y2-y1+1, x2-x1+1) with half-pixel bilinear, threshold, paste the
    image-clipped window."""
    n, m, _ = mask_probs.shape
    h, w = image_hw
    out = np.zeros((n, h, w), dtype=bool)
    scale = (m + 2.0 * padding) / m  # expand_masks, inference.py:108-116
    for i in range(n):
        padded = np.zeros((m + 2 * padding, m + 2 * padding), np.float32)
        padded[padding:-padding or None, padding:-padding or None] = mask_probs[i]
        x1, y1, x2, y2 = (float(v) for v in boxes[i])
        cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
        bw2, bh2 = (x2 - x1) * 0.5 * scale, (y2 - y1) * 0.5 * scale
        # int() truncates toward zero — identical to the int32 cast
        bx1, by1 = int(cx - bw2), int(cy - bh2)
        bx2, by2 = int(cx + bw2), int(cy + bh2)
        tw = max(bx2 - bx1 + 1, 1)
        th = max(by2 - by1 + 1, 1)
        resized = _bilinear_resize_np(padded, th, tw)
        bin_mask = resized > threshold
        dx1, dy1 = max(bx1, 0), max(by1, 0)
        dx2, dy2 = min(bx2 + 1, w), min(by2 + 1, h)
        if dx2 > dx1 and dy2 > dy1:
            out[i, dy1:dy2, dx1:dx2] = bin_mask[
                dy1 - by1 : dy2 - by1, dx1 - bx1 : dx2 - bx1
            ]
    return out


def resample_gt_crops_to_rois(gt_crops, gt_boxes, matched_gt, rois,
                              out_size: int):
    """Mask targets from box-normalized GT crops — the TPU-native stand-in
    for the reference's project_masks_on_boxes (mask_head/loss.py:16-44),
    which crops full-image masks per proposal.  Full-image masks are too
    large to batch statically (64 GT x 832x1344 per image), so the loader
    stores each instance's mask cropped to its OWN gt box at a fixed
    resolution; here each sampled RoI's target window is resampled from
    its matched gt's crop via the affine map between the two boxes.

    gt_crops [G, R, R] float in [0,1] (mask of gt g inside gt_boxes[g]),
    gt_boxes [G, 4], matched_gt [N] int32, rois [N, 4] →
    [N, out_size, out_size] float targets.
    """
    import jax
    import jax.numpy as jnp

    r = gt_crops.shape[-1]

    def one(gt_idx, roi):
        crop = gt_crops[gt_idx].astype(jnp.float32)
        gx1, gy1, gx2, gy2 = gt_boxes[gt_idx]
        gw = jnp.maximum(gx2 - gx1, 1.0)
        gh = jnp.maximum(gy2 - gy1, 1.0)
        x1, y1, x2, y2 = roi
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        # roi-grid sample points in image coords → gt-box-normalized coords
        ys = (y1 + (jnp.arange(out_size) + 0.5) / out_size * bh - gy1) / gh * r
        xs = (x1 + (jnp.arange(out_size) + 0.5) / out_size * bw - gx1) / gw * r
        inside_y = (ys >= 0) & (ys <= r)
        inside_x = (xs >= 0) & (xs <= r)
        y0 = jnp.clip(jnp.floor(ys - 0.5), 0, r - 1)
        x0 = jnp.clip(jnp.floor(xs - 0.5), 0, r - 1)
        fy = jnp.clip(ys - 0.5 - y0, 0.0, 1.0)
        fx = jnp.clip(xs - 0.5 - x0, 0.0, 1.0)
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, r - 1)
        x1i = jnp.minimum(x0 + 1, r - 1)
        v00 = crop[y0[:, None], x0[None, :]]
        v01 = crop[y0[:, None], x1i[None, :]]
        v10 = crop[y1i[:, None], x0[None, :]]
        v11 = crop[y1i[:, None], x1i[None, :]]
        top = v00 * (1 - fx)[None, :] + v01 * fx[None, :]
        bot = v10 * (1 - fx)[None, :] + v11 * fx[None, :]
        val = top * (1 - fy)[:, None] + bot * fy[:, None]
        # outside the gt box the instance mask is 0 by definition
        return val * (inside_y[:, None] & inside_x[None, :]).astype(jnp.float32)

    return jax.vmap(one)(matched_gt, rois)
