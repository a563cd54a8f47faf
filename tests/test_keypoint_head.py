import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.models.keypoint_head import (
    KeypointRCNNFeatureExtractor,
    KeypointRCNNPredictor,
    heatmaps_to_keypoints,
    keypoint_rcnn_loss,
    keypoints_to_heatmap_targets,
)


def test_keypoint_modules_shapes(rng):
    pooled = jnp.asarray(rng.randn(3, 14, 14, 8).astype(np.float32))
    ext = KeypointRCNNFeatureExtractor(layers=(8, 8))
    p1 = ext.init(jax.random.PRNGKey(0), pooled)
    feats = ext.apply(p1, pooled)
    pred = KeypointRCNNPredictor(num_keypoints=17)
    p2 = pred.init(jax.random.PRNGKey(1), feats)
    heat = pred.apply(p2, feats)
    assert heat.shape == (3, 56, 56, 17)


def test_heatmap_targets_and_loss():
    rois = jnp.array([[0.0, 0.0, 56.0, 56.0]])
    kps = jnp.array([[[28.0, 28.0, 1.0], [100.0, 100.0, 1.0], [10.0, 10.0, 0.0]]])
    idx, valid = keypoints_to_heatmap_targets(kps, rois, 56)
    assert bool(valid[0, 0])
    assert not bool(valid[0, 1])  # outside the box
    assert not bool(valid[0, 2])  # not visible
    assert int(idx[0, 0]) == 28 * 56 + 28

    logits = jnp.zeros((1, 56, 56, 3))
    loss = keypoint_rcnn_loss(logits, rois, kps, jnp.array([True]))
    np.testing.assert_allclose(float(loss), np.log(56 * 56), rtol=1e-4)


def test_heatmaps_to_keypoints_argmax():
    heat = np.full((1, 8, 8, 2), -5.0, np.float32)
    heat[0, 2, 5, 0] = 10.0  # y=2, x=5
    heat[0, 7, 1, 1] = 10.0
    rois = jnp.array([[16.0, 16.0, 80.0, 80.0]])  # box 64x64 → scale 8
    kp = np.asarray(heatmaps_to_keypoints(jnp.asarray(heat), rois))
    np.testing.assert_allclose(kp[0, 0, :2], [16 + 5.5 * 8, 16 + 2.5 * 8])
    np.testing.assert_allclose(kp[0, 1, :2], [16 + 1.5 * 8, 16 + 7.5 * 8])
    assert kp[0, 0, 2] > 0.9


def test_exact_decode_matches_reference_restatement():
    """heatmaps_to_keypoints_np vs an independent restatement of the
    reference decode loop (keypoint_head/inference.py:40-95): cv2
    INTER_CUBIC upsample to ceil(box size), argmax on the upsampled map,
    Heckbert +0.5 back-mapping, raw logit score."""
    import cv2

    from abr_iod_tpu.models.keypoint_head import heatmaps_to_keypoints_np

    rng = np.random.RandomState(11)
    n, m, k = 5, 14, 6
    maps = rng.randn(n, m, m, k).astype(np.float32)
    rois = np.zeros((n, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 50, n)
    rois[:, 1] = rng.uniform(0, 40, n)
    rois[:, 2] = rois[:, 0] + rng.uniform(3.3, 120.7, n)
    rois[:, 3] = rois[:, 1] + rng.uniform(3.3, 90.2, n)

    got = heatmaps_to_keypoints_np(maps, rois)

    for i in range(n):
        w = max(rois[i, 2] - rois[i, 0], 1)
        h = max(rois[i, 3] - rois[i, 1], 1)
        rw, rh = int(np.ceil(w)), int(np.ceil(h))
        roi_map = cv2.resize(maps[i], (rw, rh), interpolation=cv2.INTER_CUBIC)
        for j in range(k):
            ch = roi_map[:, :, j]
            y, x = np.unravel_index(np.argmax(ch), ch.shape)
            np.testing.assert_allclose(
                got[i, j, 0], (x + 0.5) * (w / rw) + rois[i, 0], rtol=1e-6)
            np.testing.assert_allclose(
                got[i, j, 1], (y + 0.5) * (h / rh) + rois[i, 1], rtol=1e-6)
            np.testing.assert_allclose(got[i, j, 2], ch[y, x], rtol=1e-6)


def test_exact_decode_subbin_localization_beats_bin_center():
    """The cv2 upsample recovers sub-bin peak positions the coarse in-jit
    argmax cannot: a peak between two bins decodes off the bin center."""
    from abr_iod_tpu.models.keypoint_head import heatmaps_to_keypoints_np

    m = 14
    maps = np.zeros((1, m, m, 1), np.float32)
    # broad peak centered between bins (6, 7) in x
    for (yy, xx), v in np.ndenumerate(np.zeros((m, m))):
        maps[0, yy, xx, 0] = -((yy - 6.0) ** 2 + (xx - 6.5) ** 2)
    box = np.asarray([[0.0, 0.0, 140.0, 140.0]], np.float32)
    kp = heatmaps_to_keypoints_np(maps, box)
    # bin centers are 10px apart; the true peak is at x=70 between the
    # centers 65 and 75 — the upsampled argmax lands within ~2px of 70
    assert abs(kp[0, 0, 0] - 70.0) < 2.5, kp
    assert abs(kp[0, 0, 1] - 65.0) < 2.5, kp
