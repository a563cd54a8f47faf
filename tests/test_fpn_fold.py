"""Folded multilevel proposal selection == the per-level loop.

`select_proposals_multilevel` batches the five FPN levels' NMS sweeps
into one vmapped sweep (models/proposals.py).  The contract vs running
`select_proposals` once per level (the reference semantics,
rpn/inference.py:120-147) and concatenating: the keep sets, output
ordering, validity, and scores are BIT-IDENTICAL — including the
padded-slot contents — and the decoded box coordinates agree to
float32 rounding (the decode runs in a different fusion context, so
XLA's FMA contraction can flip the last ULP; observed only on the CPU
backend, exact on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abr_iod_tpu.models.proposals import (
    select_proposals,
    select_proposals_multilevel,
)


def _synth_level(rng, bsz, hwa, canvas_wh):
    obj = rng.randn(bsz, hwa).astype(np.float32) * 2.0
    reg = (rng.randn(bsz, hwa, 4) * 0.3).astype(np.float32)
    # anchors roughly tiling the canvas, varied sizes
    cx = rng.uniform(0, canvas_wh[0], hwa)
    cy = rng.uniform(0, canvas_wh[1], hwa)
    w = rng.uniform(8, 200, hwa)
    h = rng.uniform(8, 200, hwa)
    anchors = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return obj, reg, anchors.astype(np.float32)


@pytest.mark.parametrize("min_size", [0.0, 4.0])
def test_fold_matches_per_level_loop(min_size):
    rng = np.random.RandomState(0)
    bsz = 3
    # uneven level widths, two of them below the pre-NMS pool size so the
    # fold's valid=False padding path is exercised
    level_sizes = (900, 400, 150, 60, 17)
    pre, post = 256, 64
    sizes_hw = jnp.asarray(
        rng.randint(200, 320, size=(bsz, 2)).astype(np.int32))

    levels = [_synth_level(rng, bsz, n, (320, 320)) for n in level_sizes]
    objs = [jnp.asarray(o) for o, _, _ in levels]
    regs = [jnp.asarray(r) for _, r, _ in levels]
    ancs = [jnp.asarray(a) for _, _, a in levels]

    kw = dict(post_nms_top_n=post, nms_thresh=0.7, min_size=min_size,
              approx_recall=0.0)

    ref_boxes, ref_scores, ref_valid = [], [], []
    for o, r, a in zip(objs, regs, ancs):
        p = select_proposals(
            o, r, a, sizes_hw, pre_nms_top_n=min(pre, o.shape[1]), **kw)
        ref_boxes.append(p.boxes)
        ref_scores.append(p.scores)
        ref_valid.append(p.valid)
    ref_boxes = jnp.concatenate(ref_boxes, axis=1)
    ref_scores = jnp.concatenate(ref_scores, axis=1)
    ref_valid = jnp.concatenate(ref_valid, axis=1)

    fold = jax.jit(
        lambda os, rs, sz: select_proposals_multilevel(
            os, rs, ancs, sz, pre_nms_top_n=pre, **kw)
    )(objs, regs, sizes_hw)

    assert fold.boxes.shape == ref_boxes.shape
    np.testing.assert_array_equal(np.asarray(fold.valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(
        np.asarray(fold.scores), np.asarray(ref_scores))
    np.testing.assert_allclose(
        np.asarray(fold.boxes), np.asarray(ref_boxes), rtol=1e-6, atol=1e-4)


def test_fold_single_level_degenerates_to_select_proposals():
    rng = np.random.RandomState(1)
    bsz = 2
    o, r, a = _synth_level(rng, bsz, 500, (256, 256))
    sizes_hw = jnp.asarray(np.array([[256, 256], [230, 210]], np.int32))
    p_ref = select_proposals(
        jnp.asarray(o), jnp.asarray(r), jnp.asarray(a), sizes_hw,
        pre_nms_top_n=128, post_nms_top_n=32, nms_thresh=0.7, min_size=0.0)
    p_fold = select_proposals_multilevel(
        [jnp.asarray(o)], [jnp.asarray(r)], [jnp.asarray(a)], sizes_hw,
        pre_nms_top_n=128, post_nms_top_n=32, nms_thresh=0.7, min_size=0.0)
    np.testing.assert_array_equal(np.asarray(p_fold.valid), np.asarray(p_ref.valid))
    np.testing.assert_array_equal(np.asarray(p_fold.scores), np.asarray(p_ref.scores))
    np.testing.assert_allclose(
        np.asarray(p_fold.boxes), np.asarray(p_ref.boxes), rtol=1e-6, atol=1e-4)
