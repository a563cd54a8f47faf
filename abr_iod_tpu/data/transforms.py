"""Host-side image transforms to a fixed canvas.

Reference: maskrcnn_benchmark/data/transforms/transforms.py —
ColorJitter → Resize(shortest side 800, cap 1333) → RandomHorizontalFlip
→ ToTensor → Normalize(RGB→BGR ×255 − Caffe2 pixel mean).

TPU difference: instead of ragged per-batch padding
(BatchCollator/to_image_list), every image lands on ONE static canvas
(cfg.TPU.CANVAS_*) so the train step compiles exactly once.  The resize
ratio is chosen so the resized image fits the canvas while honoring the
reference's (min_size, max_size) rule.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def resize_ratio(h: int, w: int, min_size: int, max_size: int,
                 canvas_hw: Tuple[int, int]) -> float:
    """The reference's shortest-side rule (transforms.py:64-93), further
    capped so the result fits the static canvas."""
    short, long = min(h, w), max(h, w)
    ratio = min_size / short
    if long * ratio > max_size:
        ratio = max_size / long
    ratio = min(ratio, canvas_hw[0] / h, canvas_hw[1] / w)
    return ratio


def resize_to_canvas(image: np.ndarray, boxes: np.ndarray, min_size: int,
                     max_size: int, canvas_hw: Tuple[int, int]):
    """Resize + zero-pad into the canvas. Returns (canvas_img float32,
    resized (h, w), scaled boxes)."""
    from PIL import Image

    h, w = image.shape[:2]
    ratio = resize_ratio(h, w, min_size, max_size, canvas_hw)
    nh, nw = max(1, int(round(h * ratio))), max(1, int(round(w * ratio)))
    nh, nw = min(nh, canvas_hw[0]), min(nw, canvas_hw[1])
    resized = np.asarray(
        Image.fromarray(image.astype(np.uint8)).resize((nw, nh), Image.BILINEAR),
        dtype=np.float32,
    )
    out = np.zeros((canvas_hw[0], canvas_hw[1], 3), np.float32)
    out[:nh, :nw] = resized
    scaled = boxes.copy().astype(np.float32)
    if scaled.size:
        scaled[:, 0::2] *= nw / w
        scaled[:, 1::2] *= nh / h
    return out, (nh, nw), scaled


def hflip(image_canvas: np.ndarray, size_hw, boxes: np.ndarray):
    """Horizontal flip inside the valid region (x → w - x - 1, matching
    BoxList.transpose)."""
    nh, nw = size_hw
    out = image_canvas.copy()
    out[:nh, :nw] = out[:nh, :nw][:, ::-1]
    flipped = boxes.copy()
    if flipped.size:
        x1 = nw - boxes[:, 2] - 1.0
        x2 = nw - boxes[:, 0] - 1.0
        flipped[:, 0], flipped[:, 2] = x1, x2
    return out, flipped


def normalize(image_canvas: np.ndarray, pixel_mean, to_bgr255: bool = True):
    """RGB→BGR, already 0-255, subtract Caffe2 mean (transforms.py:155-165)."""
    img = image_canvas
    if to_bgr255:
        img = img[..., ::-1]
    return (img - np.asarray(pixel_mean, np.float32)).astype(np.float32)


def color_jitter(image: np.ndarray, rng: np.random.RandomState,
                 brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
    """Lightweight numpy color jitter (reference wraps torchvision's;
    shipped configs leave all factors at 0 → no-op)."""
    img = image.astype(np.float32)
    if brightness > 0:
        img = img * rng.uniform(1 - brightness, 1 + brightness)
    if contrast > 0:
        mean = img.mean()
        img = (img - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    if saturation > 0:
        gray = img.mean(axis=-1, keepdims=True)
        img = (img - gray) * rng.uniform(1 - saturation, 1 + saturation) + gray
    if hue > 0:
        shift = rng.uniform(-hue, hue) * 255.0
        img = img + np.array([shift, -shift, 0.0])
    return np.clip(img, 0, 255)
