"""FPN Faster R-CNN end-to-end: CONV_BODY R-50-FPN with the standard
GeneralizedRCNN meta-architecture builds the FPN detector (reference
backbone.py:23-43 registry + rpn USE_FPN path) and its train/eval steps
run with finite, decreasing losses — not a silently-substituted C4 model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from abr_iod_tpu.config import get_default_config
from abr_iod_tpu.engine import Batch, TrainState
from abr_iod_tpu.engine.train import make_train_step
from abr_iod_tpu.engine.inference import make_eval_step
from abr_iod_tpu.models.build import build_detection_model
from abr_iod_tpu.models.fpn_detector import FasterRCNNFPN
from abr_iod_tpu.solver.optim import make_optimizer

CANVAS = (64, 128)  # divisible by 64 (P6)


def tiny_fpn_cfg():
    cfg = get_default_config()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RPN.ANCHOR_SIZES = (8, 16, 32, 64, 128)  # one per level
    cfg.MODEL.RPN.ASPECT_RATIOS = (0.5, 1.0, 2.0)
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 4
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TPU.FPN_BACKBONE_STAGES = (1, 1, 1, 1)
    cfg.TPU.CANVAS_TRAIN = CANVAS
    cfg.TPU.CANVAS_TEST = CANVAS
    cfg.TPU.PRE_NMS_TOP_N_TRAIN = 64
    cfg.TPU.POST_NMS_TOP_N_TRAIN = 16
    cfg.TPU.PRE_NMS_TOP_N_TEST = 64
    cfg.TPU.POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_GT = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.EVAL_NMS_PER_CLASS_TOPK = 10
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    return cfg


def synth_batch(rng, b=2):
    max_gt = 8
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), bool)
    for i in range(b):
        for j in range(3):
            x1, y1 = rng.uniform(0, 70), rng.uniform(0, 30)
            gt_boxes[i, j] = [x1, y1, x1 + rng.uniform(12, 40), y1 + rng.uniform(12, 28)]
            gt_labels[i, j] = rng.randint(1, 4)
            gt_mask[i, j] = True
    return Batch(
        pixels=jnp.asarray(rng.randn(b, *CANVAS, 3).astype(np.float32)),
        sizes=jnp.tile(jnp.asarray([list(CANVAS)], jnp.int32), (b, 1)),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_mask=jnp.asarray(gt_mask),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_fpn_cfg()
    model = build_detection_model(cfg)
    assert isinstance(model, FasterRCNNFPN)  # not a silently-built C4
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    return cfg, model, params


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_fpn_detector_builds_and_runs(setup):
    cfg, model, params = setup
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    out = model.apply(params, px, rois)
    # 5 pyramid levels at strides 4..64
    assert len(out["pyramid_shapes"]) == 5
    assert out["pyramid_shapes"][0][1:3] == (CANVAS[0] // 4, CANVAS[1] // 4)
    assert out["pyramid_shapes"][4][1:3] == (CANVAS[0] // 64, CANVAS[1] // 64)
    assert out["cls_logits"].shape == (1, 1, 4)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_fpn_train_step_learns(setup):
    cfg, model, params = setup
    rng = np.random.RandomState(0)
    # the jitted step donates its state — train on a copy so the shared
    # fixture params stay alive for the other tests
    params = jax.tree_util.tree_map(jnp.array, params)
    tx = make_optimizer(cfg, params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step, _ = make_train_step(model, tx, cfg, CANVAS)
    batch = synth_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses  # same batch → loss must drop


@pytest.mark.slow
def test_fpn_eval_step_produces_detections(setup):
    cfg, model, params = setup
    eval_step, _ = make_eval_step(model, cfg, CANVAS)
    rng = np.random.RandomState(1)
    px = jnp.asarray(rng.randn(2, *CANVAS, 3).astype(np.float32))
    sizes = jnp.tile(jnp.asarray([list(CANVAS)], jnp.int32), (2, 1))
    dets = eval_step(params, px, sizes)
    assert dets.boxes.shape[0] == 2 and dets.boxes.shape[2] == 4
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert np.isfinite(np.asarray(dets.scores)).all()


@pytest.mark.slow
def test_fpn_mask_variant_runs():
    cfg = tiny_fpn_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (8, 8)
    model = build_detection_model(cfg)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    out = model.apply(params, px, rois)
    # 14x14 pool -> deconv 2x -> 28x28 per-class masks
    assert out["mask_logits"].shape == (1, 1, 28, 28, 4)


def test_unknown_conv_body_rejected():
    cfg = tiny_fpn_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C6"
    with pytest.raises(ValueError, match="CONV_BODY"):
        build_detection_model(cfg)


def test_r101_fpn_gets_true_depth():
    """R-101-FPN must build 23 blocks in layer3 — the TPU stages knob only
    overrides when explicitly set (review finding: the default knob used
    to shadow the CONV_BODY-derived depth)."""
    from abr_iod_tpu.models.fpn_detector import build_fpn_detector

    cfg = tiny_fpn_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-101-FPN"
    cfg.TPU.FPN_BACKBONE_STAGES = ()  # derive from CONV_BODY
    model = build_fpn_detector(cfg)
    assert tuple(model.stages) == (3, 4, 23, 3)
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    assert tuple(build_fpn_detector(cfg).stages) == (3, 4, 6, 3)


@pytest.mark.slow
def test_fpn_gn_and_dcn_take_effect():
    """TRANS_FUNC / STAGE_WITH_DCN must reach the FPN body too (review
    finding: they were validated then discarded)."""
    cfg = tiny_fpn_cfg()
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithGN"
    cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, False, True, False)
    model = build_detection_model(cfg)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    flat = {jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    assert any("gn1" in k for k in flat), "GN not wired into FPN body"
    assert any("layer3" in k and "offset" in k for k in flat), "DCN not wired"


@pytest.mark.slow
def test_fpn_mask_eval_returns_dets_and_probs():
    """The FPN eval step must honor the C4 (dets, extras) contract so
    run_test's mask unpack works (review finding: it returned a bare
    Detections and crashed MASK_ON eval)."""
    cfg = tiny_fpn_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (8, 8)
    model = build_detection_model(cfg)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    eval_step, _ = make_eval_step(model, cfg, CANVAS)
    sizes = jnp.asarray([list(CANVAS)], jnp.int32)
    dets, mask_probs = eval_step(params, px, sizes)
    d = dets.boxes.shape[1]
    assert mask_probs.shape == (1, d, 28, 28)
    assert np.isfinite(np.asarray(mask_probs)).all()


@pytest.mark.slow
def test_group_norm_config_keys_take_effect():
    """MODEL.GROUP_NORM.{NUM_GROUPS,EPSILON,DIM_PER_GP} flow into every GN
    site (review finding: they were dead keys with hardcoded 32/1e-5)."""
    from abr_iod_tpu.models.make_layers import gn_num_groups

    assert gn_num_groups(64, num_groups=16) == 16
    assert gn_num_groups(64, num_groups=32, dim_per_gp=8) == 8  # 64/8 groups
    assert gn_num_groups(16, num_groups=32) == 16  # degrade to divisor

    cfg = tiny_fpn_cfg()
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithGN"
    cfg.MODEL.GROUP_NORM.NUM_GROUPS = 4
    model = build_detection_model(cfg)
    assert model.gn == (4, -1, 1e-5)
    # FPN USE_GN with 16-channel maps no longer crashes (group fallback)
    cfg2 = tiny_fpn_cfg()
    cfg2.MODEL.FPN.USE_GN = True
    model2 = build_detection_model(cfg2)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params2 = jax.jit(model2.init)(jax.random.PRNGKey(0), px, rois)
    out = model2.apply(params2, px, rois)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


@pytest.mark.slow
def test_fpn_keypoint_variant_trains_and_evals():
    """KEYPOINT_ON with an FPN body builds the keypoint branch (review
    finding: it used to be silently ignored), trains its loss, and the
    eval step returns (dets, keypoints)."""
    from abr_iod_tpu.engine.fpn import fpn_forward_detection_losses

    cfg = tiny_fpn_cfg()
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS = (8, 8)
    model = build_detection_model(cfg)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)

    rng = np.random.RandomState(2)
    b = synth_batch(rng, b=1)
    kps = np.zeros((1, 8, 17, 3), np.float32)
    kps[0, :, :, 0] = rng.uniform(5, 60, (8, 17))
    kps[0, :, :, 1] = rng.uniform(5, 50, (8, 17))
    kps[0, :, :, 2] = 1.0
    batch = b._replace(gt_keypoints=jnp.asarray(kps))
    total, metrics, _ = fpn_forward_detection_losses(
        model, params, batch, jax.random.PRNGKey(0), cfg
    )
    assert "loss_kp" in metrics and np.isfinite(float(metrics["loss_kp"]))

    eval_step, _ = make_eval_step(model, cfg, CANVAS)
    dets, kp_maps = eval_step(params, px, jnp.asarray([list(CANVAS)], jnp.int32))
    # raw per-detection heatmaps (host decodes exactly, like the C4 path)
    assert kp_maps.shape[:2] == dets.boxes.shape[:2]
    assert kp_maps.shape[-1] == 17
    assert np.isfinite(np.asarray(kp_maps)).all()
    from abr_iod_tpu.models.keypoint_head import heatmaps_to_keypoints_np

    d = kp_maps.shape[1]
    kps = heatmaps_to_keypoints_np(
        np.asarray(kp_maps[0]), np.asarray(dets.boxes[0]))
    assert kps.shape == (d, 17, 3)


@pytest.mark.slow
def test_fpn_rpn_only_and_cls_agnostic():
    """MODEL.RPN_ONLY and MODEL.CLS_AGNOSTIC_BBOX_REG must take effect on
    the FPN family like they do on C4 (round-2 advisor finding: they were
    silently ignored)."""
    from abr_iod_tpu.engine.fpn import fpn_forward_detection_losses

    # cls-agnostic: bbox_pred carries 2 classes' deltas (bg + fg)
    cfg = tiny_fpn_cfg()
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    model = build_detection_model(cfg)
    assert model.cls_agnostic_bbox_reg
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    kernel = params["params"]["roi_heads"]["bbox_pred"]["kernel"]
    assert kernel.shape[-1] == 2 * 4  # not num_classes*4
    out = model.apply(params, px, rois)
    assert out["box_reg"].shape == (1, 1, 4 * 4)  # expanded per class

    # rpn-only: losses are RPN-only; eval returns bare proposals
    cfg2 = tiny_fpn_cfg()
    cfg2.MODEL.RPN_ONLY = True
    model2 = build_detection_model(cfg2)
    assert model2.rpn_only
    params2 = jax.jit(model2.init)(jax.random.PRNGKey(0), px, rois)
    rng = np.random.RandomState(3)
    total, metrics, _ = fpn_forward_detection_losses(
        model2, params2, synth_batch(rng, b=1), jax.random.PRNGKey(0), cfg2
    )
    assert set(metrics) == {"loss_objectness", "loss_rpn_box_reg", "loss"}
    eval_step, _ = make_eval_step(model2, cfg2, CANVAS)
    dets = eval_step(params2, px, jnp.asarray([list(CANVAS)], jnp.int32))
    assert np.asarray(dets.labels).max() == 0  # objectness has no class


@pytest.mark.slow
def test_fpn_keypoint_pooler_resolution_honored():
    """ROI_KEYPOINT_HEAD.POOLER_RESOLUTION must drive the keypoint pool
    (round-2 advisor finding: it silently used the mask resolution)."""
    cfg = tiny_fpn_cfg()
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS = (8,)
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 10
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    model = build_detection_model(cfg)
    assert model.keypoint_pooler_resolution == 10
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, rois)
    out = model.apply(params, px, rois)
    # 10x10 pool -> 4x upsample (deconv + interp) -> 40x40 heatmaps;
    # the mask resolution (14 -> 56) must NOT leak in
    assert out["keypoint_logits"].shape[2:4] == (40, 40)


def test_fpn_adaptive_box_sampling_ratio_honored():
    """POOLER_SAMPLING_RATIO flows through unclamped: 0 selects the
    native adaptive grid (supported since round 3), 1 stays 1 (round-2
    advisor finding: both were silently clamped to 2), negatives fail."""
    cfg = tiny_fpn_cfg()
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    assert build_detection_model(cfg).pooler_sampling_ratio == 0
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 1
    assert build_detection_model(cfg).pooler_sampling_ratio == 1
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = -1
    with pytest.raises(ValueError, match="SAMPLING_RATIO"):
        build_detection_model(cfg)


def test_gn_non_divisible_realistic_config_rejected():
    """Non-divisible GN group configs raise like the reference's assert
    (round-2 advisor finding: gcd degraded them silently); the tiny-channel
    test fallback stays."""
    from abr_iod_tpu.models.make_layers import gn_num_groups

    with pytest.raises(ValueError, match="NUM_GROUPS"):
        gn_num_groups(96, num_groups=36)
    with pytest.raises(ValueError, match="DIM_PER_GP"):
        gn_num_groups(64, num_groups=32, dim_per_gp=6)
    assert gn_num_groups(16, num_groups=32) == 16  # tiny-channel fallback


@pytest.mark.slow
def test_fpn_mesh_invariance():
    """The FPN train step on an 8-way data mesh equals 1 device — in
    particular the sorted RoIAlign backend's batch-uniform lax.cond
    predicates (ops/roi_align.py multilevel_roi_align_sorted) must
    reduce correctly across shards under SPMD partitioning."""
    from abr_iod_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    cfg = tiny_fpn_cfg()
    model = build_detection_model(cfg)
    rng = np.random.RandomState(3)
    batch = synth_batch(rng, b=8)
    px = jnp.zeros((1, *CANVAS, 3))
    rois = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]])
    params0 = jax.device_get(
        jax.jit(model.init)(jax.random.PRNGKey(0), px, rois))
    tx = make_optimizer(cfg, params0)

    def run_on(n_data):
        mesh = make_mesh(n_data, 1, devices=jax.devices()[:n_data])
        with jax.sharding.set_mesh(mesh):
            sp = shard_params(mesh, params0)
            step, _ = make_train_step(model, tx, cfg, CANVAS)
            state = TrainState(sp, tx.init(sp), jnp.zeros((), jnp.int32))
            state, metrics = step(state, shard_batch(mesh, batch))
            return float(metrics["loss"]), jax.device_get(state.params)

    loss_1, p_1 = run_on(1)
    loss_dp, p_dp = run_on(8)
    assert np.isfinite(loss_1)
    assert abs(loss_dp - loss_1) / abs(loss_1) < 5e-4, (loss_dp, loss_1)
    deltas = [
        float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))
        for a, b in zip(
            jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_1)
        )
    ]
    assert max(deltas) < 1e-4, max(deltas)
