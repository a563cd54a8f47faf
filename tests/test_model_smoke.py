import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abr_iod_tpu.models import FasterRCNN


@pytest.mark.slow  # compile-heavy (fast-tier budget)
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


@pytest.mark.slow  # compile-heavy (fast-tier budget)
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


@pytest.mark.slow  # compile-heavy (fast-tier budget)
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


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_rpn_only_meta_arch():
    """MODEL.RPN_ONLY builds a proposal-only network: no RoI-head params,
    RPN-only training losses, eval returns the proposals (reference
    generalized_rcnn.py:50-119)."""
    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.models.build import build_detection_model
    from abr_iod_tpu.engine import Batch
    from abr_iod_tpu.engine.train import forward_detection_losses
    from abr_iod_tpu.engine.inference import make_eval_step
    from abr_iod_tpu.models.anchors import anchors_for_shape

    cfg = get_default_config()
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64)
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1)
    cfg.TPU.CANVAS_TRAIN = (64, 96)
    cfg.TPU.CANVAS_TEST = (64, 96)
    cfg.TPU.PRE_NMS_TOP_N_TEST = 64
    cfg.TPU.POST_NMS_TOP_N_TEST = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_detection_model(cfg)
    px = jnp.zeros((1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    flat = {jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    assert not any("roi_heads" in k for k in flat)  # no RoI stage built

    batch = Batch(
        pixels=px,
        sizes=jnp.asarray([[64, 96]], jnp.int32),
        gt_boxes=jnp.asarray([[[4.0, 4.0, 40.0, 40.0]] * 8]),
        gt_labels=jnp.ones((1, 8), jnp.int32),
        gt_mask=jnp.asarray([[True] + [False] * 7]),
    )
    anchors = anchors_for_shape(cfg, 64, 96)
    total, metrics, _ = forward_detection_losses(
        model, params, batch, jax.random.PRNGKey(0), cfg, anchors
    )
    assert set(metrics) == {"loss_objectness", "loss_rpn_box_reg", "loss"}
    assert np.isfinite(float(total))

    eval_step, _ = make_eval_step(model, cfg, (64, 96))
    dets = eval_step(params, px, batch.sizes)
    assert dets.boxes.shape == (1, 16, 4)
    assert (np.asarray(dets.labels) == 0).all()


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_cls_agnostic_bbox_reg():
    """MODEL.CLS_AGNOSTIC_BBOX_REG shrinks bbox_pred to one shared (bg,fg)
    pair broadcast over classes (reference roi_box_predictors.py +
    box_head/inference.py expand)."""
    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.models.build import build_detection_model

    cfg = get_default_config()
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64)
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1)
    cfg.TPU.RES5_BLOCKS = 1
    cfg.TPU.RES5_BOTTLENECK = 16
    cfg.TPU.RES5_OUT = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_detection_model(cfg)
    px = jnp.zeros((1, 64, 96, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0], [8.0, 8.0, 60.0, 50.0]]])
    params = model.init(jax.random.PRNGKey(0), px, rois)
    leaves = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    bp = [s for p, s in leaves.items()
          if "bbox_pred" in p and "roi_heads" in p and p.endswith("kernel']")]
    assert bp == [(32, 8)], bp  # 2 classes x 4, not 5 x 4
    out = model.apply(params, px, rois)
    assert out["box_reg"].shape == (1, 2, 20)  # broadcast back to 5 classes
    r = np.asarray(out["box_reg"]).reshape(2, 5, 4)
    assert np.allclose(r, r[:, :1, :])  # every class row identical


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_roi_head_chunked_equals_monolithic(rng):
    """TPU.ROI_HEAD_CHUNK (whole-head pool+res5+predictor chunking, the
    eval latency-hiding knob) must be output-invariant: same logits,
    box deltas, pooled features and head features as the monolithic
    head — including a chunk that does not divide the RoI count."""
    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.models.build import build_detection_model

    cfg = get_default_config()
    cfg.MODEL.RPN.ANCHOR_SIZES = (16, 32, 64)
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1)
    cfg.TPU.RES5_BLOCKS = 1
    cfg.TPU.RES5_BOTTLENECK = 16
    cfg.TPU.RES5_OUT = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"

    px = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    rois = np.zeros((2, 10, 4), np.float32)
    for b in range(2):
        for i in range(10):
            x1, y1 = rng.randint(0, 50), rng.randint(0, 30)
            rois[b, i] = [x1, y1, x1 + rng.randint(8, 40), y1 + rng.randint(8, 30)]
    rois = jnp.asarray(rois)

    model_mono = build_detection_model(cfg)
    params = jax.jit(model_mono.init)(jax.random.PRNGKey(0), px, rois)

    cfg_chunk = cfg.clone()
    cfg_chunk.TPU.ROI_HEAD_CHUNK = 4  # 10 RoIs → chunks of 4,4,2 (ragged)
    model_chunk = build_detection_model(cfg_chunk)
    # identical param tree: chunking shares the same submodule instances
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, params,
        jax.jit(model_chunk.init)(jax.random.PRNGKey(0), px, rois)))

    out_m = model_mono.apply(params, px, rois)
    out_c = model_chunk.apply(params, px, rois)
    for key in ("cls_logits", "box_reg", "roi_features"):
        np.testing.assert_allclose(
            np.asarray(out_m[key]), np.asarray(out_c[key]),
            rtol=1e-5, atol=1e-5, err_msg=key)
