import numpy as np
import jax.numpy as jnp

from abr_iod_tpu.ops.nms import nms_padded
from tests.oracles import nms_numpy


def _random_boxes(rng, n, size=400.0):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def _run_and_compare(rng, n, thresh, max_out=None, n_valid=None):
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    if n_valid is not None:
        valid[n_valid:] = False
    ref = nms_numpy(boxes[valid], scores[valid], thresh)
    ref_global = np.where(valid)[0][ref]
    max_out = max_out or n
    idx, ok = nms_padded(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(valid),
        iou_threshold=thresh,
        max_output=max_out,
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    got = idx[ok]
    expect = ref_global[:max_out]
    np.testing.assert_array_equal(got, expect)


def test_nms_small(rng):
    _run_and_compare(rng, 50, 0.5)


def test_nms_tile_boundary(rng):
    _run_and_compare(rng, 128, 0.5)
    _run_and_compare(rng, 130, 0.5)


def test_nms_multi_tile(rng):
    _run_and_compare(rng, 700, 0.5)


def test_nms_dense_overlaps(rng):
    # many overlapping boxes around few cluster centers → deep suppression chains
    centers = _random_boxes(rng, 8, size=200.0)
    boxes = np.concatenate(
        [centers + rng.uniform(-8, 8, (8, 4)).astype(np.float32) for _ in range(40)]
    )
    scores = rng.uniform(0, 1, len(boxes)).astype(np.float32)
    ref = nms_numpy(boxes, scores, 0.5)
    idx, ok = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(len(boxes), bool), 0.5, 512
    )
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(ok)], ref)


def test_nms_with_padding_and_cap(rng):
    _run_and_compare(rng, 300, 0.7, max_out=20, n_valid=200)


def test_nms_threshold_extremes(rng):
    _run_and_compare(rng, 100, 0.999)  # keep nearly all
    _run_and_compare(rng, 100, 0.01)  # suppress aggressively
