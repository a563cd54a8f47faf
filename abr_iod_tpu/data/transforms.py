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


def reference_resize_hw(h: int, w: int, min_size: int,
                        max_size: int) -> Tuple[int, int]:
    """The reference's shortest-side rule with its EXACT integer
    semantics (transforms.py:73-93 get_size): the max_size-capped target
    uses int(round(.)), the long side int(truncate) — a round-both-sides
    float-ratio version drifts by one pixel on fractional cases (e.g.
    500x375 -> reference (800, 1066), ratio-rounding gives 1067)."""
    size = int(min_size)
    if max_size is not None:
        min_o, max_o = float(min(h, w)), float(max(h, w))
        if max_o / min_o * size > max_size:
            size = int(round(max_size * min_o / max_o))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


def resize_ratio(h: int, w: int, min_size: int, max_size: int,
                 canvas_hw: Tuple[int, int]) -> float:
    """Scalar resize factor implied by the reference rule (kept for
    callers that only need an approximate ratio; the data path uses the
    exact per-axis integer sizes from reference_resize_hw)."""
    nh, nw = reference_resize_hw(h, w, min_size, max_size)
    ratio = min(nh / h, nw / w)
    return min(ratio, canvas_hw[0] / h, canvas_hw[1] / w)


def resize_to_canvas(image: np.ndarray, boxes: np.ndarray, min_size: int,
                     max_size: int, canvas_hw: Tuple[int, int],
                     dtype=np.float32):
    """Resize + zero-pad into the canvas. Returns (canvas_img, resized
    (h, w), scaled boxes).  Target sizes follow the reference's integer
    rule exactly; a result that exceeds the static canvas (only possible
    with shrunken test canvases) is scaled down to fit.

    The PIL resize runs on uint8 pixels (exactly like the reference's
    PIL-image transforms), so its output is uint8-exact: dtype=np.uint8
    emits a byte canvas losslessly — 4x less host→device traffic, with
    normalization moved onto the device (make_device_normalize)."""
    from PIL import Image

    h, w = image.shape[:2]
    nh, nw = reference_resize_hw(h, w, min_size, max_size)
    if nh > canvas_hw[0] or nw > canvas_hw[1]:
        r = min(canvas_hw[0] / nh, canvas_hw[1] / nw)
        nh, nw = max(1, int(nh * r)), max(1, int(nw * r))
    resized = np.asarray(
        Image.fromarray(image.astype(np.uint8)).resize((nw, nh), Image.BILINEAR),
        dtype=dtype,
    )
    out = np.zeros((canvas_hw[0], canvas_hw[1], 3), dtype)
    out[:nh, :nw] = resized
    scaled = boxes.copy().astype(np.float32)
    if scaled.size:
        scaled[:, 0::2] *= nw / w
        scaled[:, 1::2] *= nh / h
    return out, (nh, nw), scaled


def hflip_boxes(size_hw, boxes: np.ndarray) -> np.ndarray:
    """The box half of `hflip` (x → w - x - 1, matching
    BoxList.transpose) — used alone when the flipped canvas itself is
    already cached device-side (data/device_cache.py)."""
    nw = size_hw[1]
    flipped = boxes.copy()
    if flipped.size:
        x1 = nw - boxes[:, 2] - 1.0
        x2 = nw - boxes[:, 0] - 1.0
        flipped[:, 0], flipped[:, 2] = x1, x2
    return flipped


def hflip(image_canvas: np.ndarray, size_hw, boxes: np.ndarray):
    """Horizontal flip inside the valid region (x → w - x - 1, matching
    BoxList.transpose)."""
    nh, nw = size_hw
    out = image_canvas.copy()
    out[:nh, :nw] = out[:nh, :nw][:, ::-1]
    return out, hflip_boxes(size_hw, boxes)


def normalize(image_canvas: np.ndarray, pixel_mean, to_bgr255: bool = True):
    """RGB→BGR, already 0-255, subtract Caffe2 mean (transforms.py:155-165)."""
    img = image_canvas
    if to_bgr255:
        img = img[..., ::-1]
    return (img - np.asarray(pixel_mean, np.float32)).astype(np.float32)


def make_device_normalize(pixel_mean, to_bgr255: bool = True):
    """jit twin of `normalize` for uint8 canvases uploaded raw: the host
    ships bytes (4x less host→device traffic than the normalized f32
    canvas) and the device does uint8→f32 + BGR + mean-subtract — the
    same f32 arithmetic on the same values, so results are bit-identical
    to the host path (tests/test_data_eval.py pins it)."""
    import jax
    import jax.numpy as jnp

    mean = jnp.asarray(pixel_mean, jnp.float32)

    @jax.jit
    def fn(u8_canvas):
        x = u8_canvas.astype(jnp.float32)
        if to_bgr255:
            x = x[..., ::-1]
        return x - mean

    return fn


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
