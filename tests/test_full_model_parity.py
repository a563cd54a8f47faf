"""Full-model stage-wise numerical parity vs an independent torch oracle.

The strongest mAP-parity proxy available without real VOC data (VERDICT
round-1 item 2): identical weights through our jax forward and through a
torch re-statement of the reference forward (tests/torch_ref_model.py),
asserting closeness at every stage — backbone C4 map, RPN logits/deltas,
proposal selection, RoIAlign pooled features, box-head logits/deltas,
and final postprocessed detections.  Catches anchor-order, BGR, +1
convention, padding-semantics and FrozenBN drift that synthetic-learning
smoke tests cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

pytestmark = pytest.mark.slow  # compile-heavy tier: run with `pytest -m ""`

from abr_iod_tpu.models import FasterRCNN
from abr_iod_tpu.models.anchors import grid_anchors
from abr_iod_tpu.models.proposals import select_proposals
from abr_iod_tpu.models.postprocess import postprocess_detections
from abr_iod_tpu.models.rpn import flatten_rpn_outputs
from tests.oracles import roi_align_numpy
from tests.torch_ref_model import (
    TorchRefC4,
    copy_flax_params_to_torch,
    postprocess_np,
    select_proposals_np,
)

STAGES = (1, 1, 1)
WPG, RES2 = 8, 16
NUM_CLASSES = 4
ANCHOR_SIZES, RATIOS = (16, 32, 64), (1.0,)
CANVAS = (128, 160)
PRE_NMS, POST_NMS = 128, 32


def _randomize(params, seed=0):
    """Replace every leaf with random values so every weight's semantics is
    exercised (fresh init has zero bn3 scales → degenerate residuals)."""
    rng = np.random.RandomState(seed)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        arr = rng.normal(0.0, 0.1, np.shape(tree)).astype(np.float32)
        if path.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        return arr

    return walk(params)


@pytest.fixture(scope="module")
def setup():
    model = FasterRCNN(
        num_classes=NUM_CLASSES,
        num_anchors=len(ANCHOR_SIZES) * len(RATIOS),
        backbone_stages=STAGES,
        width_per_group=WPG,
        res2_out_channels=RES2,
        res5_blocks=1,
        res5_bottleneck=16,
        res5_out=32,
        roi_align_precision="highest",
    )
    pixels = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), pixels, jnp.zeros((1, 4, 4)) + 16.0
    )
    params = _randomize(params)

    tmodel = TorchRefC4(
        STAGES, WPG, RES2, num_anchors=3, num_classes=NUM_CLASSES,
        res5_blocks=1, res5_bottleneck=16, res5_out=32,
    ).eval()
    copy_flax_params_to_torch(params, tmodel)

    rng = np.random.RandomState(1)
    images = rng.uniform(-100, 100, (2, *CANVAS, 3)).astype(np.float32)
    return model, params, tmodel, images


def test_backbone_c4_parity(setup):
    model, params, tmodel, images = setup
    c4_jax, _ = model.apply(params, jnp.asarray(images), method="backbone")
    with torch.no_grad():
        c4_t = tmodel.backbone(torch.from_numpy(images.transpose(0, 3, 1, 2)))
    c4_t = c4_t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(c4_jax), c4_t, rtol=1e-3, atol=1e-4)


def _rpn_outputs(setup):
    model, params, tmodel, images = setup
    c4_jax, _ = model.apply(params, jnp.asarray(images), method="backbone")
    obj, reg = model.apply(params, c4_jax, method="rpn")
    with torch.no_grad():
        c4_t = tmodel.backbone(torch.from_numpy(images.transpose(0, 3, 1, 2)))
        obj_t, reg_t = tmodel.rpn(c4_t)
    return c4_jax, obj, reg, obj_t.numpy(), reg_t.numpy()


def test_rpn_head_parity(setup):
    _, obj, reg, obj_t, reg_t = _rpn_outputs(setup)
    np.testing.assert_allclose(
        np.asarray(obj), obj_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(reg), reg_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


def _proposals(setup):
    model, params, tmodel, images = setup
    c4_jax, obj, reg, obj_t, reg_t = _rpn_outputs(setup)
    obj_f, reg_f = flatten_rpn_outputs(obj, reg)
    feat_h, feat_w = CANVAS[0] // 16, CANVAS[1] // 16
    anchors = grid_anchors(feat_h, feat_w, 16, ANCHOR_SIZES, RATIOS)
    sizes = np.tile(np.asarray(CANVAS, np.int32), (2, 1))
    props = select_proposals(
        obj_f, reg_f, jnp.asarray(anchors), jnp.asarray(sizes),
        pre_nms_top_n=PRE_NMS, post_nms_top_n=POST_NMS,
        nms_thresh=0.7, min_size=0.0,
    )
    # oracle proposals from the TORCH rpn outputs (flattened to (H, W, A)
    # anchor order exactly as the reference's permute_and_flatten)
    b, a4, h, w = reg_t.shape
    a = a4 // 4
    obj_flat = obj_t.transpose(0, 2, 3, 1).reshape(b, -1)
    reg_flat = reg_t.transpose(0, 2, 3, 1).reshape(b, h * w, a, 4).reshape(b, -1, 4)
    ref = [
        select_proposals_np(
            obj_flat[i], reg_flat[i], anchors, CANVAS, PRE_NMS, POST_NMS
        )
        for i in range(b)
    ]
    return props, ref


def test_proposal_selection_parity(setup):
    props, ref = _proposals(setup)
    for i, (ref_boxes, ref_scores) in enumerate(ref):
        n = int(np.sum(np.asarray(props.valid[i])))
        assert n == len(ref_boxes), f"image {i}: {n} vs {len(ref_boxes)} proposals"
        np.testing.assert_allclose(
            np.asarray(props.boxes[i][:n]), ref_boxes, rtol=1e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(props.scores[i][:n]), ref_scores, rtol=1e-3, atol=1e-5
        )


def test_roi_head_and_detections_parity(setup):
    model, params, tmodel, images = setup
    props, ref = _proposals(setup)
    c4_jax, _ = model.apply(params, jnp.asarray(images), method="backbone")

    # feed BOTH models the same proposal boxes (ours) so head parity is
    # isolated from any upstream NMS tie-breaking
    rois = props.boxes
    cls_jax, reg_jax, pooled_jax, _ = model.apply(
        params, c4_jax, rois, method="roi_heads"
    )

    with torch.no_grad():
        c4_t = tmodel.backbone(torch.from_numpy(images.transpose(0, 3, 1, 2)))
    c4_np = c4_t.numpy().transpose(0, 2, 3, 1)
    for i in range(2):
        pooled_ref = roi_align_numpy(
            c4_np[i], np.asarray(rois[i]), output_size=7,
            spatial_scale=1.0 / 16, sampling_ratio=2,
        )  # [S, 7, 7, C]
        np.testing.assert_allclose(
            np.asarray(pooled_jax[i]), pooled_ref, rtol=1e-3, atol=1e-4
        )
        with torch.no_grad():
            cls_t, reg_t = tmodel.box_head(
                torch.from_numpy(pooled_ref.transpose(0, 3, 1, 2).copy())
            )
        np.testing.assert_allclose(
            np.asarray(cls_jax[i]), cls_t.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(reg_jax[i]), reg_t.numpy(), rtol=1e-3, atol=1e-4
        )

        # final detections: our static-shape postprocess vs the numpy
        # restatement of filter_results
        sizes = np.tile(np.asarray(CANVAS, np.int32), (2, 1))
        dets = postprocess_detections(
            cls_jax, reg_jax, rois, props.valid, jnp.asarray(sizes),
            score_thresh=0.05, nms_thresh=0.5, detections_per_img=100,
            per_class_topk=POST_NMS,
        )
        n_valid_props = int(np.sum(np.asarray(props.valid[i])))
        ref_boxes, ref_scores, ref_labels = postprocess_np(
            cls_t.numpy()[:n_valid_props], reg_t.numpy()[:n_valid_props],
            np.asarray(rois[i][:n_valid_props]), CANVAS,
        )
        v = np.asarray(dets.valid[i])
        got_scores = np.asarray(dets.scores[i])[v]
        got_boxes = np.asarray(dets.boxes[i])[v]
        got_labels = np.asarray(dets.labels[i])[v]
        assert len(got_scores) == len(ref_scores), (
            f"image {i}: {len(got_scores)} vs {len(ref_scores)} detections"
        )
        # set-matching: identical-score detections can sort in either order,
        # so greedily pair each reference detection with an unmatched ours
        # (same label, score within 1e-4, box within 5e-3)
        unmatched = list(range(len(got_scores)))
        for rb_, rs_, rl_ in zip(ref_boxes, ref_scores, ref_labels):
            hit = None
            for k in unmatched:
                if (
                    got_labels[k] == rl_
                    and abs(got_scores[k] - rs_) < 1e-4
                    and np.abs(got_boxes[k] - rb_).max() < 5e-3
                ):
                    hit = k
                    break
            assert hit is not None, (
                f"image {i}: unmatched reference detection "
                f"label={rl_} score={rs_:.6f} box={rb_}"
            )
            unmatched.remove(hit)
        assert not unmatched
