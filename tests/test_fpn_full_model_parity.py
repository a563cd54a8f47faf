"""FPN full-model stage-wise numerical parity vs an independent torch
oracle (tests/torch_ref_fpn.py) — the FPN-family analogue of
test_full_model_parity.py.

Identical weights through our jax FasterRCNNFPN and through a torch
re-statement of the reference FPN forward, asserted stage by stage:
the C2..C5 -> P2..P6 pyramid (lateral/top-down merge + P6 maxpool), the
SHARED per-level RPN head, per-level proposal selection + cross-level
FPN_POST_NMS_TOP_N reduction (rpn/inference.py:120-176), the LevelMapper
assignment formula, multi-level RoIAlign, the 2-MLP box head, and final
postprocessed detections.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

pytestmark = pytest.mark.slow  # compile-heavy tier

from abr_iod_tpu.config import get_default_config
from abr_iod_tpu.engine.fpn import _select_fpn_proposals, fpn_level_anchors
from abr_iod_tpu.models.anchors import grid_anchors
from abr_iod_tpu.models.fpn import fpn_level_mapper
from abr_iod_tpu.models.fpn_detector import FPN_STRIDES, FasterRCNNFPN
from abr_iod_tpu.models.postprocess import postprocess_detections
from tests.test_full_model_parity import _randomize
from tests.torch_ref_fpn import (
    TorchRefFPN, copy_flax_fpn_params_to_torch, fpn_level_np,
    fpn_roi_align_np,
)
from tests.torch_ref_model import postprocess_np, select_proposals_np

STAGES = (1, 1, 1, 1)
WPG, RES2, FPN_OUT, REP = 8, 16, 32, 64
NUM_CLASSES = 5
ANCHOR_SIZES = (16, 32, 64, 128, 256)  # one per level P2..P6
RATIOS = (0.5, 1.0)
CANVAS = (128, 192)  # divisible by 64: every upsample is an exact 2x
PRE_NMS, POST_NMS, FPN_POST = 64, 16, 48


def _cfg():
    cfg = get_default_config()
    cfg.MODEL.RPN.ANCHOR_SIZES = ANCHOR_SIZES
    cfg.MODEL.RPN.ASPECT_RATIOS = RATIOS
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = POST_NMS
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = FPN_POST
    cfg.MODEL.RPN.MIN_SIZE = 0
    return cfg


@pytest.fixture(scope="module")
def setup():
    model = FasterRCNNFPN(
        num_classes=NUM_CLASSES,
        num_anchors=len(RATIOS),
        stages=STAGES,
        width_per_group=WPG,
        res2_out_channels=RES2,
        fpn_out_channels=FPN_OUT,
        representation_size=REP,
    )
    pixels = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), pixels, jnp.zeros((1, 4, 4)) + 16.0
    )
    params = _randomize(params, seed=11)

    tmodel = TorchRefFPN(
        STAGES, WPG, RES2, FPN_OUT, num_anchors=len(RATIOS),
        num_classes=NUM_CLASSES, representation_size=REP,
    ).eval()
    copy_flax_fpn_params_to_torch(params, tmodel)

    rng = np.random.RandomState(2)
    images = rng.uniform(-100, 100, (2, *CANVAS, 3)).astype(np.float32)
    return model, params, tmodel, images


def _pyramids(setup):
    model, params, tmodel, images = setup
    pyr_jax, _ = model.apply(params, jnp.asarray(images), method="backbone")
    with torch.no_grad():
        pyr_t = tmodel.fpn(
            tmodel.backbone(torch.from_numpy(images.transpose(0, 3, 1, 2)))
        )
    return pyr_jax, [p.numpy().transpose(0, 2, 3, 1) for p in pyr_t]


def test_pyramid_parity(setup):
    pyr_jax, pyr_t = _pyramids(setup)
    assert len(pyr_jax) == len(pyr_t) == 5
    for lvl, (pj, pt) in enumerate(zip(pyr_jax, pyr_t)):
        assert pj.shape == pt.shape, f"P{lvl + 2}: {pj.shape} vs {pt.shape}"
        np.testing.assert_allclose(
            np.asarray(pj), pt, rtol=1e-3, atol=1e-4, err_msg=f"P{lvl + 2}"
        )


def _rpn_outputs(setup):
    model, params, tmodel, images = setup
    pyr_jax, _ = model.apply(params, jnp.asarray(images), method="backbone")
    outs_jax = model.apply(params, pyr_jax, method="rpn")
    with torch.no_grad():
        outs_t = tmodel.rpn(tmodel.fpn(
            tmodel.backbone(torch.from_numpy(images.transpose(0, 3, 1, 2)))
        ))
    return pyr_jax, outs_jax, [(o.numpy(), r.numpy()) for o, r in outs_t]


def test_rpn_shared_head_all_levels_parity(setup):
    _, outs_jax, outs_t = _rpn_outputs(setup)
    for lvl, ((oj, rj), (ot, rt)) in enumerate(zip(outs_jax, outs_t)):
        np.testing.assert_allclose(
            np.asarray(oj), ot.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4,
            err_msg=f"objectness P{lvl + 2}")
        np.testing.assert_allclose(
            np.asarray(rj), rt.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4,
            err_msg=f"deltas P{lvl + 2}")


def test_level_mapper_matches_reference_formula():
    rng = np.random.RandomState(5)
    x1 = rng.uniform(0, 50, 256).astype(np.float32)
    y1 = rng.uniform(0, 50, 256).astype(np.float32)
    side = np.exp(rng.uniform(np.log(4), np.log(1200), 256)).astype(np.float32)
    rois = np.stack([x1, y1, x1 + side, y1 + side * 0.7], axis=1)
    want = fpn_level_np(rois)
    assert len(np.unique(want)) == 4, "probe must span all levels"
    got = np.asarray(fpn_level_mapper(jnp.asarray(rois)))
    np.testing.assert_array_equal(got, want)


def _proposals(setup):
    model, params, tmodel, images = setup
    pyr_jax, outs_jax, outs_t = _rpn_outputs(setup)
    cfg = _cfg()
    anchors_l = fpn_level_anchors(cfg, [p.shape for p in pyr_jax])
    sizes = jnp.asarray(np.tile(np.asarray(CANVAS, np.int32), (2, 1)))
    pb, ps, pv = _select_fpn_proposals(outs_jax, anchors_l, sizes, cfg,
                                       train=False)

    # oracle: per-level selection from the TORCH outputs, then the
    # cross-level top-N by objectness (select_over_all_levels)
    ref = []
    for i in range(2):
        lvl_boxes, lvl_scores = [], []
        for (ot, rt), stride, size in zip(outs_t, FPN_STRIDES, ANCHOR_SIZES):
            b, a4, h, w = rt.shape
            a = a4 // 4
            anchors = grid_anchors(h, w, stride, (size,), RATIOS)
            obj_flat = ot.transpose(0, 2, 3, 1).reshape(b, -1)
            reg_flat = rt.transpose(0, 2, 3, 1).reshape(
                b, h * w, a, 4).reshape(b, -1, 4)
            bx, sc = select_proposals_np(
                obj_flat[i], reg_flat[i], np.asarray(anchors), CANVAS,
                PRE_NMS, POST_NMS)
            lvl_boxes.append(bx)
            lvl_scores.append(sc)
        boxes = np.concatenate(lvl_boxes)
        scores = np.concatenate(lvl_scores)
        order = np.argsort(-scores, kind="stable")[:FPN_POST]
        ref.append((boxes[order], scores[order]))
    return (pb, ps, pv), ref


def test_fpn_proposal_selection_parity(setup):
    (pb, ps, pv), ref = _proposals(setup)
    for i, (ref_boxes, ref_scores) in enumerate(ref):
        n = int(np.sum(np.asarray(pv[i])))
        assert n == len(ref_boxes), f"image {i}: {n} vs {len(ref_boxes)}"
        np.testing.assert_allclose(
            np.asarray(ps[i][:n]), ref_scores, rtol=1e-3, atol=1e-5,
            err_msg=f"image {i} scores")
        np.testing.assert_allclose(
            np.asarray(pb[i][:n]), ref_boxes, rtol=1e-3, atol=5e-3,
            err_msg=f"image {i} boxes")


def test_fpn_roi_head_and_detections_parity(setup):
    model, params, tmodel, images = setup
    (pb, ps, pv), _ = _proposals(setup)
    pyr_jax, _ = model.apply(params, jnp.asarray(images), method="backbone")

    # feed BOTH sides the same proposal boxes (ours) so head parity is
    # isolated from upstream NMS tie-breaking
    rois = pb
    cls_jax, reg_jax, pooled_jax, _ = model.apply(
        params, pyr_jax, rois, method="roi_heads"
    )
    _, pyr_t = _pyramids(setup)
    sizes = jnp.asarray(np.tile(np.asarray(CANVAS, np.int32), (2, 1)))
    dets = postprocess_detections(
        cls_jax, reg_jax, rois, pv, sizes,
        score_thresh=0.05, nms_thresh=0.5, detections_per_img=100,
        per_class_topk=FPN_POST,
    )
    for i in range(2):
        rois_np = np.asarray(rois[i])
        # multi-level pooled features: LevelMapper + per-level RoIAlign
        pooled_ref = fpn_roi_align_np(
            [p[i] for p in pyr_t[:4]], rois_np,
            scales=tuple(1.0 / s for s in FPN_STRIDES[:4]))
        np.testing.assert_allclose(
            np.asarray(pooled_jax[i]), pooled_ref, rtol=1e-3, atol=1e-4,
            err_msg=f"image {i} pooled")
        with torch.no_grad():
            cls_t, reg_t = tmodel.box_head(
                torch.from_numpy(pooled_ref.transpose(0, 3, 1, 2).copy()))
        np.testing.assert_allclose(
            np.asarray(cls_jax[i]), cls_t.numpy(), rtol=1e-3, atol=1e-4,
            err_msg=f"image {i} logits")
        np.testing.assert_allclose(
            np.asarray(reg_jax[i]), reg_t.numpy(), rtol=1e-3, atol=1e-4,
            err_msg=f"image {i} deltas")

        n_valid = int(np.sum(np.asarray(pv[i])))
        ref_boxes, ref_scores, ref_labels = postprocess_np(
            cls_t.numpy()[:n_valid], reg_t.numpy()[:n_valid],
            rois_np[:n_valid], CANVAS)
        v = np.asarray(dets.valid[i])
        got_scores = np.asarray(dets.scores[i])[v]
        got_boxes = np.asarray(dets.boxes[i])[v]
        got_labels = np.asarray(dets.labels[i])[v]
        assert len(got_scores) == len(ref_scores), (
            f"image {i}: {len(got_scores)} vs {len(ref_scores)} detections")
        unmatched = list(range(len(got_scores)))
        for rb_, rs_, rl_ in zip(ref_boxes, ref_scores, ref_labels):
            hit = None
            for k in unmatched:
                if (got_labels[k] == rl_
                        and abs(got_scores[k] - rs_) < 1e-4
                        and np.abs(got_boxes[k] - rb_).max() < 5e-3):
                    hit = k
                    break
            assert hit is not None, (
                f"image {i}: unmatched reference detection "
                f"label={rl_} score={rs_:.6f} box={rb_}")
            unmatched.remove(hit)
        assert not unmatched
