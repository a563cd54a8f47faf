"""RetinaNet full-model numerical parity vs an independent torch oracle
(tests/torch_ref_fpn.py TorchRefRetinaNet) — completes the full-model
torch-parity coverage across the detector families (C4, FPN, RetinaNet).

Identical weights through our jax RetinaNetDetector and a torch
re-statement of the reference single-stage forward, asserted stage by
stage: the P3..P7 pyramid with the LastLevelP6P7 convs on C5, the shared
conv towers + cls/bbox heads on every level, and the full inference path
(per-level threshold + top-k candidates, decode(10,10,5,5), cross-level
per-class NMS, top-N) against the numpy restatement of
retinanet/inference.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

pytestmark = pytest.mark.slow  # compile-heavy tier

from abr_iod_tpu.models.retinanet import (
    RetinaNetDetector,
    retinanet_anchors,
    retinanet_postprocess,
)
from tests.test_full_model_parity import _randomize
from tests.test_fpn_retinanet import _retinanet_postprocess_oracle
from tests.torch_ref_fpn import (
    TorchRefRetinaNet, copy_flax_retinanet_params_to_torch,
)

STAGES = (1, 1, 1, 1)
WPG, RES2, CHANNELS = 8, 16, 32
NUM_CLASSES = 4  # logits carry C-1 = 3
RATIOS = (0.5, 1.0)
OCTAVES = 2  # A = 4 per location
NUM_CONVS = 2
CANVAS = (128, 192)
STRIDES = (8, 16, 32, 64, 128)
SIZES = (16, 32, 64, 128, 256)


@pytest.fixture(scope="module")
def setup():
    model = RetinaNetDetector(
        num_classes=NUM_CLASSES,
        anchor_ratios=RATIOS,
        scales_per_octave=OCTAVES,
        num_convs=NUM_CONVS,
        channels=CHANNELS,
        backbone_stages=STAGES,
        width_per_group=WPG,
        res2_out_channels=RES2,
    )
    pixels = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pixels)
    params = _randomize(params, seed=13)

    tmodel = TorchRefRetinaNet(
        STAGES, WPG, RES2, CHANNELS,
        num_anchors=len(RATIOS) * OCTAVES,
        num_classes_m1=NUM_CLASSES - 1,
        num_convs=NUM_CONVS,
    ).eval()
    copy_flax_retinanet_params_to_torch(params, tmodel)

    rng = np.random.RandomState(4)
    images = rng.uniform(-100, 100, (2, *CANVAS, 3)).astype(np.float32)
    return model, params, tmodel, images


def test_retinanet_pyramid_parity(setup):
    model, params, tmodel, images = setup
    pyr_jax = model.apply(params, jnp.asarray(images), method="pyramid")
    with torch.no_grad():
        pyr_t = tmodel.pyramid(torch.from_numpy(images.transpose(0, 3, 1, 2)))
    assert len(pyr_jax) == len(pyr_t) == 5
    for lvl, (pj, pt) in enumerate(zip(pyr_jax, pyr_t)):
        pt = pt.numpy().transpose(0, 2, 3, 1)
        assert pj.shape == pt.shape, f"P{lvl + 3}: {pj.shape} vs {pt.shape}"
        np.testing.assert_allclose(
            np.asarray(pj), pt, rtol=1e-3, atol=1e-4, err_msg=f"P{lvl + 3}")


def _head_outputs(setup):
    model, params, tmodel, images = setup
    logits, bbox = model.apply(params, jnp.asarray(images))
    with torch.no_grad():
        outs_t = tmodel.head(
            tmodel.pyramid(torch.from_numpy(images.transpose(0, 3, 1, 2))))
    return logits, bbox, [(o.numpy(), r.numpy()) for o, r in outs_t]


def test_retinanet_head_parity(setup):
    logits, bbox, outs_t = _head_outputs(setup)
    for lvl, (lj, rj, (lt, rt)) in enumerate(zip(logits, bbox, outs_t)):
        np.testing.assert_allclose(
            np.asarray(lj), lt.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4,
            err_msg=f"cls P{lvl + 3}")
        np.testing.assert_allclose(
            np.asarray(rj), rt.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4,
            err_msg=f"bbox P{lvl + 3}")


def test_retinanet_detections_parity(setup):
    model, params, tmodel, images = setup
    logits, bbox, outs_t = _head_outputs(setup)
    shapes = [tuple(l.shape[1:3]) for l in logits]
    anchors_pl = [
        retinanet_anchors([hw], strides=[s], sizes=[sz], ratios=RATIOS,
                          scales_per_octave=OCTAVES)
        for hw, s, sz in zip(shapes, STRIDES, SIZES)
    ]
    sizes = np.tile(np.asarray(CANVAS, np.int32), (2, 1))
    dets = retinanet_postprocess(
        logits, bbox, [jnp.asarray(a) for a in anchors_pl],
        jnp.asarray(sizes), num_classes=NUM_CLASSES,
        pre_nms_top_n=200, detections_per_img=60,
    )
    a, c_m1 = len(RATIOS) * OCTAVES, NUM_CLASSES - 1
    for i in range(2):
        # oracle candidates from the TORCH head outputs
        scores_pl = [
            1 / (1 + np.exp(-lt[i].transpose(1, 2, 0).reshape(-1, a, c_m1)
                            .reshape(-1, c_m1).astype(np.float64)))
            for lt, _ in outs_t
        ]
        reg_pl = [
            rt[i].transpose(1, 2, 0).reshape(-1, a, 4).reshape(-1, 4)
            for _, rt in outs_t
        ]
        rb, rs, rl = _retinanet_postprocess_oracle(
            scores_pl, reg_pl, anchors_pl, CANVAS,
            pre_nms_top_n=200, detections_per_img=60)
        v = np.asarray(dets.valid[i])
        gb = np.asarray(dets.boxes[i])[v]
        gs = np.asarray(dets.scores[i])[v]
        gl = np.asarray(dets.labels[i])[v]
        assert len(gs) == len(rs), f"image {i}: {len(gs)} vs {len(rs)}"
        unmatched = list(range(len(gs)))
        for rb_, rs_, rl_ in zip(rb, rs, rl):
            hit = None
            for k in unmatched:
                if (gl[k] == rl_ and abs(gs[k] - rs_) < 1e-4
                        and np.abs(gb[k] - rb_).max() < 5e-3):
                    hit = k
                    break
            assert hit is not None, (
                f"image {i}: unmatched reference detection "
                f"label={rl_} score={rs_:.6f} box={rb_}")
            unmatched.remove(hit)
        assert not unmatched
