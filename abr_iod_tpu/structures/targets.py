"""Fixed-shape detection targets and image batches.

Replaces the reference's ``BoxList`` + ``ImageList``
(maskrcnn_benchmark/structures/{bounding_box.py,image_list.py}) with
static pytrees suitable for jit: every image carries MAX_GT padded boxes
and every batch is padded to one canvas shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Targets(NamedTuple):
    """Ground truth for a batch of images.

    boxes:  [B, MAX_GT, 4] xyxy in *resized* image coordinates
    labels: [B, MAX_GT] int32 — 1-based class ids (0 = padding/background)
    mask:   [B, MAX_GT] bool — validity
    """

    boxes: jnp.ndarray
    labels: jnp.ndarray
    mask: jnp.ndarray


class ImageBatch(NamedTuple):
    """A batch of images padded to a common static canvas.

    pixels: [B, H, W, 3] float32/bf16 — normalized (BGR*255 - pixel_mean,
            matching the reference's Caffe2 convention,
            reference: data/transforms/transforms.py:155-165)
    sizes:  [B, 2] int32 — (h, w) of the valid (resized, pre-padding) region
    """

    pixels: jnp.ndarray
    sizes: jnp.ndarray

    @property
    def canvas_hw(self):
        return self.pixels.shape[1], self.pixels.shape[2]
