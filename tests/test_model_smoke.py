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
