import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.models import FasterRCNN


def test_faster_rcnn_forward_shapes():
    model = FasterRCNN(num_classes=5, num_anchors=3)
    pixels = jnp.zeros((1, 64, 96, 3))
    rois = jnp.array([[[4.0, 4.0, 40.0, 40.0], [10.0, 10.0, 80.0, 60.0]]])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    out = model.apply(params, pixels, rois)
    assert out["features"].shape == (1, 4, 6, 1024)  # stride 16
    assert out["objectness"].shape == (1, 4, 6, 3)
    assert out["rpn_box_deltas"].shape == (1, 4, 6, 12)
    assert out["cls_logits"].shape == (1, 2, 5)
    assert out["box_reg"].shape == (1, 2, 20)
    assert out["roi_features"].shape == (1, 2, 7, 7, 1024)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_frozen_bn_identity_at_init():
    from abr_iod_tpu.models import FrozenBatchNorm

    bn = FrozenBatchNorm(4)
    x = jnp.ones((1, 2, 2, 4)) * 3.0
    params = bn.init(jax.random.PRNGKey(0), x)
    y = bn.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), 3.0)


def test_faster_rcnn_mask_and_keypoint_variants():
    model = FasterRCNN(
        num_classes=4, num_anchors=3, backbone_stages=(1, 1, 1),
        width_per_group=8, res2_out_channels=16, res5_blocks=1,
        res5_bottleneck=16, res5_out=32, mask_on=True, keypoint_on=True,
    )
    pixels = jnp.zeros((1, 64, 96, 3))
    rois = jnp.array([[[4.0, 4.0, 40.0, 40.0], [10.0, 10.0, 80.0, 60.0]]])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    out = model.apply(params, pixels, rois)
    assert out["mask_logits"].shape == (1, 2, 14, 14, 4)
    assert out["keypoint_logits"].shape == (1, 2, 28, 28, 17)
    feats, _ = model.apply(params, pixels, method="backbone")
    m = model.apply(params, feats, rois, method="mask_heads")
    assert m.shape == (1, 2, 14, 14, 4)
