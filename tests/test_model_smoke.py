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


def test_frozen_prefix_stop_gradient():
    """FREEZE_CONV_BODY_AT prefixes must (a) leave the forward untouched
    and (b) yield exactly-zero gradients for the frozen stem/layer params
    (the reference's requires_grad=False — resnet.py:134-143; here a
    stop_gradient lets XLA skip the dead backward segment)."""
    from abr_iod_tpu.models.resnet import ResNetC4

    def mk(freeze_at):
        return ResNetC4(stages=(1, 1, 1), width_per_group=8,
                        res2_out_channels=16, freeze_at=freeze_at)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3))
    m0, m2 = mk(0), mk(2)
    params = m0.init(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x)[0] ** 2)

    v0, g0 = jax.value_and_grad(loss(m0))(params)
    v2, g2 = jax.value_and_grad(loss(m2))(params)
    assert float(v0) == float(v2)  # stop_gradient is forward-identity

    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_flatten_with_path(g2)[0]}
    checked_frozen = checked_live = 0
    for k, v in flat0:
        ks = jax.tree_util.keystr(k)
        if "stem" in ks or "layer1" in ks:
            assert float(np.abs(flat2[ks]).max()) == 0.0, ks
            checked_frozen += 1
        else:
            np.testing.assert_allclose(
                np.asarray(flat2[ks]), np.asarray(v), rtol=1e-6, atol=1e-8,
                err_msg=ks,
            )
            checked_live += 1
    assert checked_frozen and checked_live


def test_stem_space_to_depth_equivalence():
    """The space-to-depth stem conv must compute the plain 7x7/2 conv's
    exact sum from the SAME [7,7,3,64] parameter (models/resnet.py
    _StemConvS2D; MXU lane-utilization optimization, not a semantic
    change)."""
    from abr_iod_tpu.models.resnet import Stem

    rng = np.random.RandomState(0)
    for h, w in [(64, 96), (128, 128)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        plain = Stem(space_to_depth=False)
        params = plain.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.randn(*a.shape), jnp.float32)
            if a.ndim == 4 else a,
            params,
        )
        y_plain = plain.apply(params, x)
        y_s2d = Stem(space_to_depth=True).apply(params, x)
        assert y_plain.shape == y_s2d.shape
        np.testing.assert_allclose(
            np.asarray(y_s2d), np.asarray(y_plain), atol=1e-4, rtol=1e-5
        )
