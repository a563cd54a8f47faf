"""Mask paste-back parity vs a torch restatement of the reference Masker
(mask_head/inference.py:90-160): expand_boxes x (M+2p)/M, expand_masks
zero-pad, the int32 box cast (truncation toward zero), w/h from the
integer endpoints (+1), F.interpolate bilinear align_corners=False, then
threshold and image-clipped paste.  Pins the exact integer semantics and
the no-antialias bilinear that a PIL-based resize would silently change.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from abr_iod_tpu.structures.masks import paste_masks_in_image


def _paste_torch(mask, box, im_h, im_w, thresh=0.5, padding=1):
    """Independent torch restatement of paste_mask_in_image."""
    m = mask.shape[-1]
    scale = float(m + 2 * padding) / m
    padded = torch.zeros((m + 2 * padding, m + 2 * padding))
    padded[padding:-padding, padding:-padding] = torch.from_numpy(mask)

    w_half = (box[2] - box[0]) * 0.5 * scale
    h_half = (box[3] - box[1]) * 0.5 * scale
    x_c, y_c = (box[2] + box[0]) * 0.5, (box[3] + box[1]) * 0.5
    b = torch.tensor([x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half])
    b = b.to(dtype=torch.int32)

    w = max(int(b[2] - b[0] + 1), 1)
    h = max(int(b[3] - b[1] + 1), 1)
    resized = F.interpolate(padded[None, None], size=(h, w), mode="bilinear",
                            align_corners=False)[0, 0]
    binm = resized > thresh
    im_mask = torch.zeros((im_h, im_w), dtype=torch.bool)
    x_0, x_1 = max(int(b[0]), 0), min(int(b[2]) + 1, im_w)
    y_0, y_1 = max(int(b[1]), 0), min(int(b[3]) + 1, im_h)
    if x_1 > x_0 and y_1 > y_0:
        im_mask[y_0:y_1, x_0:x_1] = binm[
            (y_0 - int(b[1])):(y_1 - int(b[1])),
            (x_0 - int(b[0])):(x_1 - int(b[0]))]
    return im_mask.numpy()


def _smooth_probs(rng, m):
    """Blob-like probabilities with no values near the 0.5 threshold after
    interpolation-scale smoothing (keeps the binary compare exact)."""
    yy, xx = np.mgrid[0:m, 0:m].astype(np.float32)
    cy, cx = rng.uniform(m * 0.3, m * 0.7, 2)
    r = rng.uniform(m * 0.2, m * 0.45)
    d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    return np.clip(1.2 - d / r, 0.02, 0.98).astype(np.float32)


def test_paste_masks_matches_torch_masker_restatement():
    rng = np.random.RandomState(9)
    m, im_h, im_w = 28, 120, 160
    cases = [
        [10.0, 12.0, 70.5, 88.2],     # interior, fractional, upscale
        [-3.2, -6.9, 30.0, 25.0],     # negative expanded coords (trunc!)
        [130.0, 95.0, 159.0, 119.0],  # clipped at the far edges
        [40.0, 50.0, 52.3, 58.7],     # downscale: box smaller than M
        [0.0, 0.0, 159.0, 119.0],     # whole image
    ]
    probs = np.stack([_smooth_probs(rng, m) for _ in cases])
    boxes = np.asarray(cases, np.float32)
    ours = paste_masks_in_image(probs, boxes, (im_h, im_w))
    for i, box in enumerate(cases):
        want = _paste_torch(probs[i], box, im_h, im_w)
        mismatch = int((ours[i] != want).sum())
        assert mismatch == 0, f"case {i}: {mismatch} mismatched pixels"
        if i != 1:  # every non-degenerate case paints something
            assert want.any()
