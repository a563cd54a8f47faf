import numpy as np
import pytest
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

pytestmark = pytest.mark.slow  # compile-heavy tier: run with `pytest -m ""`


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


def _retinanet_postprocess_oracle(scores_pl, reg_pl, anchors_pl, size_hw,
                                  pre_nms_thresh=0.05, pre_nms_top_n=1000,
                                  nms_thresh=0.4, detections_per_img=100):
    """Numpy restatement of reference retinanet/inference.py:60-174."""
    from tests.torch_ref_model import clip_boxes_np, decode_boxes_np
    from tests.oracles import nms_numpy

    boxes_all, scores_all, labels_all = [], [], []
    for scores, reg, anchors in zip(scores_pl, reg_pl, anchors_pl):
        n_l, c_m1 = scores.shape
        flat = scores.reshape(-1)
        cand = np.where(flat > pre_nms_thresh)[0]
        if len(cand) > pre_nms_top_n:
            cand = cand[np.argsort(-flat[cand], kind="stable")[:pre_nms_top_n]]
        a_idx, cls = cand // c_m1, cand % c_m1 + 1
        det = decode_boxes_np(reg[a_idx], anchors[a_idx], (10.0, 10.0, 5.0, 5.0))
        det = clip_boxes_np(det, size_hw)
        boxes_all.append(det)
        scores_all.append(flat[cand])
        labels_all.append(cls)
    boxes = np.concatenate(boxes_all)
    scores = np.concatenate(scores_all)
    labels = np.concatenate(labels_all)
    kb, ks, kl = [], [], []
    for j in np.unique(labels):
        m = labels == j
        keep = nms_numpy(boxes[m], scores[m], nms_thresh)
        kb.append(boxes[m][keep]); ks.append(scores[m][keep])
        kl.append(np.full(len(keep), j, np.int32))
    boxes, scores, labels = map(np.concatenate, (kb, ks, kl))
    if len(scores) > detections_per_img:
        order = np.argsort(-scores, kind="stable")[:detections_per_img]
        boxes, scores, labels = boxes[order], scores[order], labels[order]
    return boxes, scores, labels


def test_retinanet_postprocess_matches_oracle(rng):
    from abr_iod_tpu.models.retinanet import retinanet_postprocess

    c_m1, a = 3, 3
    shapes = [(8, 12), (4, 6)]
    strides, sizes = (8, 16), (32, 64)
    anchors_pl = [
        retinanet_anchors([hw], strides=[s], sizes=[sz], ratios=(1.0,),
                          scales_per_octave=a)
        for hw, s, sz in zip(shapes, strides, sizes)
    ]
    logits = [
        jnp.asarray(rng.randn(2, h, w, a * c_m1).astype(np.float32) * 2 - 2)
        for (h, w) in shapes
    ]
    bbox = [
        jnp.asarray(rng.randn(2, h, w, a * 4).astype(np.float32) * 0.1)
        for (h, w) in shapes
    ]
    size_hw = np.array([[64, 96], [64, 96]], np.int32)

    dets = retinanet_postprocess(
        logits, bbox, [jnp.asarray(x) for x in anchors_pl],
        jnp.asarray(size_hw), num_classes=c_m1 + 1,
        pre_nms_top_n=64, detections_per_img=50,
    )

    for i in range(2):
        scores_pl = [
            1 / (1 + np.exp(-np.asarray(l[i]).reshape(-1, a, c_m1).reshape(-1, c_m1)))
            for l in logits
        ]
        reg_pl = [np.asarray(b[i]).reshape(-1, 4) for b in bbox]
        rb, rs, rl = _retinanet_postprocess_oracle(
            scores_pl, reg_pl, anchors_pl, size_hw[i],
            pre_nms_top_n=64, detections_per_img=50,
        )
        v = np.asarray(dets.valid[i])
        gb, gs, gl = (np.asarray(dets.boxes[i])[v], np.asarray(dets.scores[i])[v],
                      np.asarray(dets.labels[i])[v])
        assert len(gs) == len(rs), (len(gs), len(rs))
        og, orf = np.lexsort((gs, gl)), np.lexsort((rs, rl))
        np.testing.assert_array_equal(gl[og], rl[orf])
        np.testing.assert_allclose(gs[og], rs[orf], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gb[og], rb[orf], rtol=1e-4, atol=1e-3)


def test_retinanet_detector_end_to_end(rng):
    """RETINANET_ON builds the single-stage detector; forward + postprocess
    produce detections (reference retinanet.py RetinaNetModule)."""
    from abr_iod_tpu.config import get_default_config
    from abr_iod_tpu.models.build import build_detection_model
    from abr_iod_tpu.models.retinanet import (
        retinanet_anchors, retinanet_postprocess,
    )

    cfg = get_default_config()
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 8
    cfg.TPU.BACKBONE_STAGES = (1, 1, 1, 1)
    cfg.TPU.RETINANET_CHANNELS = 16

    model = build_detection_model(cfg)
    pixels = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pixels)
    logits, bbox = model.apply(params, pixels)
    assert len(logits) == 5  # P3..P7
    shapes = [tuple(l.shape[1:3]) for l in logits]
    anchors_pl = [
        jnp.asarray(retinanet_anchors(
            [hw], strides=[s], sizes=[sz],
            ratios=tuple(cfg.MODEL.RETINANET.ASPECT_RATIOS)))
        for hw, s, sz in zip(shapes,
                             tuple(cfg.MODEL.RETINANET.ANCHOR_STRIDES),
                             tuple(cfg.MODEL.RETINANET.ANCHOR_SIZES))
    ]
    dets = retinanet_postprocess(
        logits, bbox, anchors_pl, jnp.asarray([[64, 64]], np.int32),
        num_classes=5, pre_nms_top_n=100, detections_per_img=20,
    )
    assert dets.boxes.shape == (1, 20, 4)
    # prior-prob bias init puts every sigmoid score near .01 < .05 → no
    # detections from a fresh model, exactly like the reference
    assert not bool(np.asarray(dets.valid).any())

    # push logits up so candidates exist, then detections appear
    logits_hot = [l + 4.0 for l in logits]
    dets2 = retinanet_postprocess(
        logits_hot, bbox, anchors_pl, jnp.asarray([[64, 64]], np.int32),
        num_classes=5, pre_nms_top_n=100, detections_per_img=20,
    )
    assert bool(np.asarray(dets2.valid).any())


def test_fpn_xconv_extractor():
    """FPNXconv1fcFeatureExtractor variant (reference
    roi_box_feature_extractors.py:104-163): N stacked 3x3 convs (+GN) →
    fc6 → FPN predictor."""
    import numpy as np

    head = FPNBoxHead(num_classes=5, representation_size=16,
                      extractor="FPNXconv1fcFeatureExtractor",
                      conv_head_dim=32, num_stacked_convs=2, use_gn=True)
    feats = [jnp.zeros((1, 16 // (2 ** i), 24 // (2 ** i), 8))
             for i in range(4)]
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0], [8.0, 8.0, 60.0, 50.0]]])
    params = head.init(jax.random.PRNGKey(0), feats, rois)
    flat = {jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    assert any("xconv0" in k for k in flat)
    assert any("xconv1_gn" in k for k in flat)
    assert not any("fc7" in k for k in flat)  # 1fc variant
    logits, reg, pool = head.apply(params, feats, rois)
    assert logits.shape == (1, 2, 5) and reg.shape == (1, 2, 20)
    assert np.isfinite(np.asarray(logits)).all()
