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
