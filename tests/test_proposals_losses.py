import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abr_iod_tpu.models import anchors as A
from abr_iod_tpu.models import losses as L
from abr_iod_tpu.models.proposals import select_proposals, append_gt_proposals
from abr_iod_tpu.structures import boxes as B


def test_cell_anchors_match_detectron_code():
    # the canonical stride-16 anchors produced by the reference's
    # generate_anchors() (anchor_generator.py). Note: the MATLAB table in
    # the reference's comment block is 1-indexed — the python code (and we)
    # produce exactly those values minus 1.
    got = A.cell_anchors(16, (128, 256, 512), (0.5, 1.0, 2.0))
    expect = (
        np.array(
            [
                [-83, -39, 100, 56],
                [-175, -87, 192, 104],
                [-359, -183, 376, 200],
                [-55, -55, 72, 72],
                [-119, -119, 136, 136],
                [-247, -247, 264, 264],
                [-35, -79, 52, 96],
                [-79, -167, 96, 184],
                [-167, -343, 184, 360],
            ],
            dtype=np.float32,
        )
        - 1.0
    )
    np.testing.assert_array_equal(got, expect)


def test_grid_anchor_order():
    g = A.grid_anchors(2, 3, stride=16, sizes=(32,), aspect_ratios=(1.0,))
    assert g.shape == (6, 4)
    # (h, w) raster order: second anchor shifted by stride in x
    np.testing.assert_allclose(g[1] - g[0], [16, 0, 16, 0])
    np.testing.assert_allclose(g[3] - g[0], [0, 16, 0, 16])


def test_select_proposals_shapes_and_validity(rng):
    hwa = 4 * 5 * 3
    anchors = jnp.asarray(A.grid_anchors(4, 5, 16, (32, 64), (0.5, 1.0))[: hwa * 0 + 4 * 5 * 4])
    n = anchors.shape[0]
    obj = jnp.asarray(rng.randn(2, n).astype(np.float32))
    reg = jnp.asarray(rng.randn(2, n, 4).astype(np.float32) * 0.1)
    sizes = jnp.array([[64, 80], [64, 80]], dtype=jnp.int32)
    props = select_proposals(obj, reg, anchors, sizes, 32, 16, 0.7, 0.0)
    assert props.boxes.shape == (2, 16, 4)
    assert props.valid.shape == (2, 16)
    bx = np.asarray(props.boxes)[np.asarray(props.valid)]
    assert (bx[:, 0] >= 0).all() and (bx[:, 2] <= 79).all()
    # scores descending among valid
    sc = np.asarray(props.scores)
    for i in range(2):
        v = np.asarray(props.valid)[i]
        s = sc[i][v]
        assert (np.diff(s) <= 1e-6).all()


def test_append_gt():
    from abr_iod_tpu.models.proposals import Proposals

    p = Proposals(jnp.zeros((1, 4, 4)), jnp.zeros((1, 4)), jnp.zeros((1, 4), bool))
    gt = jnp.ones((1, 3, 4))
    mask = jnp.array([[True, True, False]])
    out = append_gt_proposals(p, gt, mask)
    assert out.boxes.shape == (1, 7, 4)
    assert np.asarray(out.valid).sum() == 2
    assert np.asarray(out.scores)[0, 4] == 1.0


def _toy_scene():
    gt_boxes = jnp.array([[[10.0, 10.0, 60.0, 60.0], [100.0, 100.0, 160.0, 180.0], [0, 0, 0, 0]]])
    gt_labels = jnp.array([[1, 3, 0]], dtype=jnp.int32)
    gt_mask = jnp.array([[True, True, False]])
    return gt_boxes, gt_labels, gt_mask


def test_rpn_targets_and_loss():
    gt_boxes, gt_labels, gt_mask = _toy_scene()
    anchors = jnp.asarray(A.grid_anchors(14, 14, 16, (32, 64, 128), (0.5, 1.0, 2.0)))
    n = anchors.shape[0]
    vis = jnp.ones((1, n), bool)
    tgts = L.prepare_rpn_targets(anchors, vis, gt_boxes, gt_labels, gt_mask)
    labels = np.asarray(tgts.labels)[0]
    assert (labels == 1).sum() >= 2  # low-quality recovery gives each gt a match
    assert (labels == 0).sum() > 0
    obj = jnp.zeros((1, n))
    reg = jnp.zeros((1, n, 4))
    ol, bl = L.rpn_loss(obj, reg, tgts, jax.random.PRNGKey(0),
                        anchors=anchors, gt_boxes=gt_boxes)
    assert np.isfinite(float(ol)) and np.isfinite(float(bl))
    assert abs(float(ol) - np.log(2)) < 0.05  # zero logits → BCE ≈ ln2


def test_roi_targets_subsample_and_loss():
    gt_boxes, gt_labels, gt_mask = _toy_scene()
    # proposals: one on each gt, some background, some padding
    prop_boxes = jnp.array(
        [
            [
                [12.0, 11.0, 58.0, 62.0],
                [98.0, 104.0, 158.0, 176.0],
                [300.0, 300.0, 340.0, 340.0],
                [200.0, 10.0, 260.0, 50.0],
                [0.0, 0.0, 0.0, 0.0],
            ]
        ]
    )
    prop_valid = jnp.array([[True, True, True, True, False]])
    tgts = L.prepare_roi_targets(prop_boxes, prop_valid, gt_boxes, gt_labels, gt_mask)
    labels = np.asarray(tgts.labels)[0]
    np.testing.assert_array_equal(labels, [1, 3, 0, 0, -1])

    rois, rlabels, rtgts, valid, is_pos, matched = L.subsample_rois(
        tgts, prop_boxes, jax.random.PRNGKey(0), batch_size_per_image=8,
        positive_fraction=0.25,
    )
    assert rois.shape == (1, 8, 4)
    v = np.asarray(valid)[0]
    assert v.sum() == 4  # 2 pos + 2 neg available
    assert np.asarray(is_pos)[0].sum() == 2

    logits = jnp.zeros((1, 8, 4))  # 4 classes (bg + 3)
    box_reg = jnp.zeros((1, 8, 16))
    cls_l, box_l = L.roi_box_loss(logits, box_reg, rlabels, rtgts, valid)
    assert abs(float(cls_l) - np.log(4)) < 1e-5  # uniform logits → ln C
    assert np.isfinite(float(box_l))


def test_inclusive_classification_loss_folds_old_classes():
    # 1 bg + 2 old + 2 new classes; labels only bg or new
    b, s, c, n_old = 1, 4, 5, 2
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (b, s, c))
    labels = jnp.array([[0, 3, 4, 0]], dtype=jnp.int32)
    reg_t = jnp.zeros((b, s, 4))
    box_reg = jnp.zeros((b, s, 4 * c))
    valid = jnp.ones((b, s), bool)
    cls_id, _ = L.roi_box_loss(
        logits, box_reg, labels, reg_t, valid, dist_type="id", n_old_classes=n_old
    )
    # manual computation
    lg = np.asarray(logits)[0]
    den = np.log(np.exp(lg).sum(-1))
    out_bg = np.log(np.exp(lg[:, : n_old + 1]).sum(-1)) - den
    expect = []
    for i, lab in enumerate([0, 3, 4, 0]):
        if lab == 0:
            expect.append(-out_bg[i])
        else:
            expect.append(-(lg[i, lab] - den[i]))
    np.testing.assert_allclose(float(cls_id), np.mean(expect), rtol=1e-5)


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_postprocess_with_background(rng):
    from abr_iod_tpu.models.postprocess import postprocess_with_background

    b, s, c = 1, 8, 4
    cls_logits = jnp.asarray(rng.randn(b, s, c).astype(np.float32))
    box_reg = jnp.asarray(rng.randn(b, s, 4 * c).astype(np.float32) * 0.1)
    boxes = jnp.asarray(rng.uniform(0, 50, (b, s, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(30)
    valid = jnp.ones((b, s), bool)
    sizes = jnp.array([[96, 128]], dtype=jnp.int32)
    dets, bg = postprocess_with_background(
        cls_logits, box_reg, boxes, valid, sizes, detections_per_img=10,
        per_class_topk=4,
    )
    assert dets.boxes.shape == (1, 10, 4)
    bg_boxes, bg_scores, bg_ok = bg
    assert bg_boxes.shape == (1, 4, 4)
    assert np.isfinite(np.asarray(bg_scores)).all()
