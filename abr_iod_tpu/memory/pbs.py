"""Prototype Box Selection (PBS).

Reference: tools/prototype_box_selection.py:61-158 — run the frozen
model over the current-task train set, collect per-GT-box pooled RoI
features (channel-mean over the 7x7 pooled map) and class logits via
``generate_feature_logits_by_targets`` (generalized_rcnn.py:169-175),
drop boxes whose BOTH sides are ≤70 px in original coordinates
(prototype_box_selection.py:133), bucket by new class.

Note: the reference indexes logits with ``target_scores[img_n + ind]``
(:141) which mis-addresses boxes beyond the first image of a batch; we
use the correct flattened per-box index (logits are not consumed by any
selection strategy, so parity is unaffected).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def make_feature_extract_fn(model):
    """jit fn: (params, pixels, boxes [B,M,4]) → (logits [B,M,C],
    mean_feats [B,M,P,P])."""

    @jax.jit
    def run(params, pixels, boxes):
        features, _ = model.apply(params, pixels, method="backbone")
        cls_logits, _, roi_feats, _ = model.apply(
            params, features, boxes, method="roi_heads"
        )
        mean_feats = jnp.mean(roi_feats.astype(jnp.float32), axis=-1)  # channel mean
        return cls_logits, mean_feats

    return run


def extract_bboxes_and_features(model, params, loader, cfg) -> List[List[dict]]:
    """Returns all_bboxes_info: per-new-class lists of PBS entries."""
    n_old = len(cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES)
    new_classes = tuple(cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES)
    run = make_feature_extract_fn(model)

    from ..data.transforms import make_device_normalize

    norm_px = make_device_normalize(
        cfg.INPUT.PIXEL_MEAN, bool(cfg.INPUT.TO_BGR255)
    )
    all_info: List[List[dict]] = [[] for _ in range(len(new_classes))]
    for batch, records, n_valid in loader.eval_batches():
        px = (norm_px(batch.pixels) if batch.pixels.dtype == np.uint8
              else batch.pixels)
        logits, feats = run(params, px, batch.gt_boxes)
        logits = np.asarray(logits)
        feats = np.asarray(feats)
        for i in range(n_valid):
            rec = records[i]
            n_boxes = int(batch.gt_mask[i].sum())
            for j in range(min(n_boxes, rec["boxes"].shape[0])):
                box = rec["boxes"][j]  # original coordinates
                if (box[2] - box[0]) <= 70 and (box[3] - box[1]) <= 70:
                    continue
                label = int(rec["labels"][j])
                bucket = label - n_old - 1
                if not (0 <= bucket < len(new_classes)):
                    continue
                all_info[bucket].append(
                    {
                        "feature": feats[i, j],  # [P, P] channel-mean map
                        "logits": logits[i, j],
                        "image_path": rec["img_id"],
                        "box_class": label,
                        "box": box.tolist(),
                    }
                )
    return all_info
