"""Keypoint structures (reference: structures/keypoint.py:8-188).

Keypoints are fixed-shape arrays [N, K, 3] (x, y, visibility); this
module holds the COCO person-keypoint vocabulary, the horizontal-flip
index map, and the coordinate transforms BoxList-style code did with
per-instance objects.
"""

from __future__ import annotations

import numpy as np

PERSON_KEYPOINT_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip", "left_knee",
    "right_knee", "left_ankle", "right_ankle",
)

_FLIP_MAP = {
    "left_eye": "right_eye", "left_ear": "right_ear",
    "left_shoulder": "right_shoulder", "left_elbow": "right_elbow",
    "left_wrist": "right_wrist", "left_hip": "right_hip",
    "left_knee": "right_knee", "left_ankle": "right_ankle",
}


def flip_inds() -> np.ndarray:
    """Permutation applied to the K axis under horizontal flip
    (reference keypoint.py FLIP_INDS)."""
    full = dict(_FLIP_MAP, **{v: k for k, v in _FLIP_MAP.items()})
    return np.asarray(
        [PERSON_KEYPOINT_NAMES.index(full.get(n, n)) for n in PERSON_KEYPOINT_NAMES],
        dtype=np.int64,
    )


def hflip_keypoints(keypoints: np.ndarray, width: float) -> np.ndarray:
    """[N, K, 3] horizontal flip: mirror x, swap left/right keypoints.
    The left/right swap is the person vocabulary's; other K just mirror."""
    if keypoints.shape[1] == len(PERSON_KEYPOINT_NAMES):
        out = keypoints[:, flip_inds()].copy()
    else:
        out = keypoints.copy()
    out[..., 0] = width - out[..., 0] - 1
    out[..., 0] *= (out[..., 2] > 0)  # invisible points stay at 0
    return out


def resize_keypoints(keypoints: np.ndarray, ratio_w: float, ratio_h: float):
    out = keypoints.copy()
    out[..., 0] *= ratio_w
    out[..., 1] *= ratio_h
    return out
