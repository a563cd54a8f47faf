"""Native C++ host data plane vs numpy semantics."""

import numpy as np
import pytest

from abr_iod_tpu.data import native
from tests.oracles import nms_numpy


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("libabrhost.so not built (no compiler?)")


def test_assemble_batch_matches_numpy(rng):
    n, h, w = 5, 16, 24
    cache = rng.randint(0, 255, (n, h, w, 3)).astype(np.uint8)
    sizes = np.tile(np.array([[12, 20]], np.int32), (n, 1))
    indices = np.array([3, 0, 4], np.int64)
    flip = np.array([1, 0, 1], np.uint8)
    mean = [102.98, 115.95, 122.77]

    got = native.assemble_batch(cache, sizes, indices, flip, mean, True)

    for k, idx in enumerate(indices):
        img = cache[idx].astype(np.float32)
        vh, vw = sizes[idx]
        if flip[k]:
            img[:vh, :vw] = img[:vh, :vw][:, ::-1]
        expect = img[..., ::-1] - np.asarray(mean, np.float32)
        np.testing.assert_allclose(got[k], expect, atol=1e-5)


def test_native_nms_matches_oracle(rng):
    x1 = rng.uniform(0, 300, 200)
    y1 = rng.uniform(0, 300, 200)
    boxes = np.stack([x1, y1, x1 + rng.uniform(5, 80, 200),
                      y1 + rng.uniform(5, 80, 200)], 1).astype(np.float32)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    got = native.nms_greedy(boxes, scores, 0.5)
    expect = nms_numpy(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, expect)


def test_native_iou_matrix(rng):
    a = np.array([[0, 0, 9, 9]], np.float32)
    b = np.array([[5, 0, 14, 9], [100, 100, 109, 109]], np.float32)
    got = native.iou_matrix(a, b)
    np.testing.assert_allclose(got[0], [50.0 / 150.0, 0.0], rtol=1e-6)
