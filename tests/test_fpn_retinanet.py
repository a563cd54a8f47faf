import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.models.backbone import ResNetFPNBackbone, build_backbone_module
from abr_iod_tpu.models.fpn import FPN, fpn_level_mapper, fpn_roi_align
from abr_iod_tpu.models.fpn_box_head import FPNBoxHead
from abr_iod_tpu.models.retinanet import (
    RetinaNetHead,
    flatten_retinanet_outputs,
    retinanet_anchors,
    retinanet_loss,
)


def test_fpn_shapes(rng):
    feats = [
        jnp.asarray(rng.randn(1, 32 // s, 48 // s, 8 * s).astype(np.float32))
        for s in (1, 2, 4, 8)
    ]
    fpn = FPN(out_channels=16)
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert len(outs) == 5  # P2..P6
    for o, s in zip(outs[:4], (1, 2, 4, 8)):
        assert o.shape == (1, 32 // s, 48 // s, 16)
    assert outs[4].shape == (1, 2, 3, 16)


def test_fpn_backbone(rng):
    bb = ResNetFPNBackbone(stages=(1, 1, 1, 1), width_per_group=4,
                           res2_out_channels=8, fpn_out_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = bb.init(jax.random.PRNGKey(0), x)
    pyramid, c_feats = bb.apply(params, x)
    assert len(pyramid) == 5 and len(c_feats) == 4
    assert pyramid[0].shape == (1, 16, 16, 16)  # P2 stride 4


def test_level_mapper():
    rois = jnp.array(
        [
            [0, 0, 31, 31],      # small → level 0 (P2)
            [0, 0, 223, 223],    # canonical → level 2 (P4)
            [0, 0, 1000, 1000],  # huge → level 3 (P5)
        ],
        dtype=jnp.float32,
    )
    lvl = np.asarray(fpn_level_mapper(rois))
    assert lvl[0] == 0 and lvl[1] == 2 and lvl[2] == 3


def test_fpn_roi_align_selects_levels(rng):
    feats = [
        jnp.asarray(rng.randn(64 // s, 64 // s, 4).astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    rois = jnp.array([[0.0, 0.0, 30.0, 30.0], [0.0, 0.0, 250.0, 250.0]])
    out = fpn_roi_align(feats, rois, output_size=3)
    assert out.shape == (2, 3, 3, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_fpn_box_head(rng):
    feats = [
        jnp.asarray(rng.randn(1, 32 // s, 32 // s, 8).astype(np.float32))
        for s in (1, 2, 4, 8)
    ]
    rois = jnp.array([[[0.0, 0.0, 40.0, 40.0], [8.0, 8.0, 90.0, 90.0]]])
    head = FPNBoxHead(num_classes=5, representation_size=16)
    params = head.init(jax.random.PRNGKey(0), feats, rois)
    logits, box_reg, pool = head.apply(params, feats, rois)
    assert logits.shape == (1, 2, 5)
    assert box_reg.shape == (1, 2, 20)


def test_retinanet_head_and_loss(rng):
    feats = [jnp.asarray(rng.randn(1, 8 // s, 12 // s, 8).astype(np.float32))
             for s in (1, 2, 4)]
    head = RetinaNetHead(num_classes=4, num_anchors=9, num_convs=2, channels=8)
    params = head.init(jax.random.PRNGKey(0), feats)
    logits, bbox = head.apply(params, feats)
    assert logits[0].shape == (1, 8, 12, 9 * 3)
    assert bbox[0].shape == (1, 8, 12, 36)
    # prior-prob bias init → initial foreground probability ≈ 0.01
    p = jax.nn.sigmoid(logits[0])
    assert 0.005 < float(p.mean()) < 0.02

    shapes = [(8, 12), (4, 6), (2, 3)]
    anchors = jnp.asarray(retinanet_anchors(shapes, strides=(8, 16, 32),
                                            sizes=(32, 64, 128)))
    fl, fb = flatten_retinanet_outputs(logits, bbox, 3)
    assert fl.shape[1] == anchors.shape[0]

    gt_boxes = jnp.array([[[4.0, 4.0, 60.0, 60.0], [0, 0, 0, 0]]])
    gt_labels = jnp.array([[2, 0]], dtype=jnp.int32)
    gt_mask = jnp.array([[True, False]])
    cls_l, reg_l = retinanet_loss(fl, fb, anchors, gt_boxes, gt_labels, gt_mask)
    assert np.isfinite(float(cls_l)) and np.isfinite(float(reg_l))
    assert float(cls_l) > 0


def test_build_backbone_module_dispatch():
    from abr_iod_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 8
    m = build_backbone_module(cfg)
    assert m.__class__.__name__ == "ResNetC4"
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    m = build_backbone_module(cfg)
    assert m.__class__.__name__ == "ResNetFPNBackbone"
