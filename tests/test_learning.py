"""Learning-signal smoke: the full train step fits synthetic VOC.

Synthetic classes are color-coded rectangles, so a tiny model must reach
non-trivial mAP within a few hundred steps if (and only if) the anchors,
matching, sampling, losses, and postprocessing are all consistent — this
is the closest thing to the reference's train-then-eval quality gate
(SURVEY.md §4) that fits in CI.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from abr_iod_tpu.config import get_default_config, VOC_CLASSES
from abr_iod_tpu.data.loader import DetectionLoader
from abr_iod_tpu.data.synthetic import make_synthetic_voc
from abr_iod_tpu.data.voc import VOCDataSource
from abr_iod_tpu.engine import TrainState, make_train_step, make_eval_step
from abr_iod_tpu.evaluation.voc_eval import eval_detection_voc
from abr_iod_tpu.solver.optim import make_optimizer

from tests.test_train_step import tiny_model

pytestmark = pytest.mark.slow  # compile-heavy tier: run with `pytest -m ""`

CANVAS = (128, 160)
N_CLASSES = 3


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vlearn") / "VOC2007")
    make_synthetic_voc(root, n_images=16, classes=VOC_CLASSES[:N_CLASSES],
                       image_hw=(128, 160), max_objects=2, seed=3)
    return root


def _cfg():
    cfg = get_default_config()
    cfg.MODEL.RPN.ANCHOR_SIZES = (24, 48, 96)
    cfg.MODEL.RPN.ASPECT_RATIOS = (0.5, 1.0, 2.0)
    cfg.TPU.PRE_NMS_TOP_N_TRAIN = 256
    cfg.TPU.POST_NMS_TOP_N_TRAIN = 64
    cfg.TPU.PRE_NMS_TOP_N_TEST = 256
    cfg.TPU.POST_NMS_TOP_N_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 48
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 30
    cfg.SOLVER.STEPS = (10000,)
    cfg.TPU.MAX_GT = 8
    cfg.TPU.CANVAS_TRAIN = CANVAS
    cfg.TPU.CANVAS_TEST = CANVAS
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 160
    return cfg


def _evaluate(model, cfg, params, loader):
    eval_step, _ = make_eval_step(model, cfg, CANVAS)
    preds, gts = [], []
    for batch, records, n_valid in loader.eval_batches():
        dets = eval_step(params, jnp.asarray(batch.pixels), jnp.asarray(batch.sizes))
        for i in range(n_valid):
            v = np.asarray(dets.valid[i])
            preds.append({
                "boxes": np.asarray(dets.boxes[i])[v],
                "labels": np.asarray(dets.labels[i])[v],
                "scores": np.asarray(dets.scores[i])[v],
            })
            rec = records[i]
            nh, nw = batch.sizes[i]
            sx, sy = rec["width"] / nw, rec["height"] / nh
            preds[-1]["boxes"] = preds[-1]["boxes"] * np.array([sx, sy, sx, sy])
            gts.append({"boxes": rec["boxes"], "labels": rec["labels"],
                        "difficult": rec["difficult"]})
    return eval_detection_voc(preds, gts)["map"]


def test_training_improves_map(voc_root):
    from abr_iod_tpu.models import FasterRCNN

    cfg = _cfg()
    model = FasterRCNN(
        num_classes=N_CLASSES + 1, num_anchors=9,
        backbone_stages=(1, 1, 1), width_per_group=8, res2_out_channels=16,
        res5_blocks=1, res5_bottleneck=16, res5_out=32,
    )

    src = VOCDataSource(voc_root, "trainval", "train_new", (),
                        VOC_CLASSES[:N_CLASSES], ())
    loader = DetectionLoader(src, cfg, batch_size=4, is_train=True, seed=0)

    pixels = jnp.zeros((4, *CANVAS, 3))
    rois = jnp.zeros((4, 2, 4)) + jnp.asarray([0.0, 0.0, 20.0, 20.0])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    tx = make_optimizer(cfg, params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    train_step, _ = make_train_step(model, tx, cfg, CANVAS)

    eval_src = VOCDataSource(voc_root, "trainval", "test_all", (),
                             VOC_CLASSES[:N_CLASSES], (), keep_difficult=True)
    eval_loader = DetectionLoader(eval_src, cfg, batch_size=4, is_train=False,
                                  canvas=CANVAS, flip=False)

    map_before = _evaluate(model, cfg, state.params, eval_loader)

    losses = []
    for it, batch in enumerate(loader.batches(max_batches=150), 1):
        state, metrics = train_step(state, batch)
        if it % 50 == 0:
            losses.append(float(metrics["loss"]))

    map_after = _evaluate(model, cfg, state.params, eval_loader)
    # training-set mAP: random init ≈ 0, fitted must clear it decisively
    assert map_after > max(map_before + 0.15, 0.2), (
        f"mAP before={map_before:.3f} after={map_after:.3f} losses={losses}"
    )
