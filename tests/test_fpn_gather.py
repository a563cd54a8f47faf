"""Gather-backend multi-level RoIAlign parity.

TPU.FPN_ROI_ALIGN_BACKEND='gather' (ops/roi_align.py
multilevel_roi_align_gather) must match both the einsum realization
(pool-all-levels + where-select, models/fpn.py) and the per-level numpy
restatement of the reference Pooler (tests/torch_ref_fpn.py
fpn_roi_align_np; reference maskrcnn_benchmark/modeling/poolers.py +
csrc/cuda/ROIAlign_cuda.cu) — values AND feature gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abr_iod_tpu.models.fpn import fpn_level_mapper, fpn_roi_align
from tests.torch_ref_fpn import fpn_roi_align_np

SCALES = (0.25, 0.125, 0.0625, 0.03125)


def _pyramid(rng, c=24, h2=64, w2=104, dtype=np.float32):
    feats = []
    h, w = h2, w2
    for _ in range(4):
        feats.append(rng.standard_normal((h, w, c)).astype(dtype))
        h, w = (h + 1) // 2, (w + 1) // 2
    return feats


def _rois(rng, n=48, img_h=256, img_w=416):
    """Sizes spanning every FPN level incl. degenerate + out-of-range."""
    x1 = rng.uniform(-10, img_w - 20, n)
    y1 = rng.uniform(-10, img_h - 20, n)
    bw = rng.uniform(2, 400, n)
    bh = rng.uniform(2, 320, n)
    rois = np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)
    rois[0] = [5.0, 5.0, 5.0, 5.0]        # zero-area (forced 1x1)
    rois[1] = [-30, -30, -5, -5]          # fully outside (weight-0 taps)
    rois[2] = [img_w - 2, img_h - 2, img_w + 40, img_h + 40]  # edge clamp
    return rois


def test_gather_matches_einsum_and_oracle():
    rng = np.random.default_rng(0)
    feats = _pyramid(rng)
    rois = _rois(rng)
    jf = [jnp.asarray(f) for f in feats]
    jr = jnp.asarray(rois)

    out_e = fpn_roi_align(jf, jr, scales=SCALES, precision="highest",
                          backend="einsum")
    out_g = fpn_roi_align(jf, jr, scales=SCALES, precision="highest",
                          backend="gather")
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)

    ref = fpn_roi_align_np(feats, rois, scales=SCALES)
    np.testing.assert_allclose(np.asarray(out_g), ref, rtol=1e-4, atol=1e-4)


def test_default_dispatch():
    """Per-image 'default' is einsum; adaptive ratio stays einsum."""
    rng = np.random.default_rng(1)
    feats = [jnp.asarray(f) for f in _pyramid(rng, c=8, h2=32, w2=48)]
    rois = jnp.asarray(_rois(rng, n=8, img_h=128, img_w=192))
    out_d = fpn_roi_align(feats, rois, scales=SCALES)  # backend='default'
    out_e = fpn_roi_align(feats, rois, scales=SCALES, backend="einsum")
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_e))
    # adaptive grid: served by the einsum path, bit-equal to it
    out_a = fpn_roi_align(feats, rois, scales=SCALES, sampling_ratio=0)
    out_ae = fpn_roi_align(feats, rois, scales=SCALES, sampling_ratio=0,
                           backend="einsum")
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_ae))


def _batched(rng, b=3, n=37, c=16, h2=48, w2=80, img_h=192, img_w=320):
    feats = [[] for _ in range(4)]
    rois = []
    for _ in range(b):
        py = _pyramid(rng, c=c, h2=h2, w2=w2)
        for i in range(4):
            feats[i].append(py[i])
        rois.append(_rois(rng, n=n, img_h=img_h, img_w=img_w))
    jf = [jnp.asarray(np.stack(f)) for f in feats]
    jr = jnp.asarray(np.stack(rois))
    return jf, jr


def test_sorted_matches_vmapped_einsum():
    """Batched 'sorted' (conditional level skip; the heads' default) ==
    per-image einsum, values and feature grads; R not a chunk multiple."""
    from abr_iod_tpu.models.fpn import fpn_roi_align_batched

    rng = np.random.default_rng(5)
    jf, jr = _batched(rng)

    def run(backend):
        def f(*fs):
            return fpn_roi_align_batched(
                list(fs), jr, scales=SCALES, precision="highest",
                backend=backend)
        out, vjp = jax.vjp(f, *jf)
        ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
        return out, vjp(ct), ct

    rng_state = rng.bit_generator.state
    out_s, g_s, _ = run("sorted")
    rng.bit_generator.state = rng_state  # same cotangent for both runs
    out_e, g_e, _ = run("einsum")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_e),
                               rtol=1e-4, atol=1e-4)
    for a, b_ in zip(g_s, g_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
    # default dispatch of the batched entry IS the sorted path
    out_d = fpn_roi_align_batched(jf, jr, scales=SCALES,
                                  precision="highest")
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


def test_sorted_single_level_case():
    """All RoIs on one level → 3 of 4 level conds skip; still exact."""
    from abr_iod_tpu.models.fpn import fpn_roi_align_batched

    rng = np.random.default_rng(6)
    jf, _ = _batched(rng, b=2, n=5)
    # tiny boxes → every RoI assigned P2
    rois = np.tile(np.array([[4.0, 4.0, 24.0, 20.0]], np.float32), (2, 5, 1))
    rois += rng.uniform(0, 8, (2, 5, 4)).astype(np.float32) * [1, 1, 1, 1]
    jr = jnp.asarray(rois)
    out_s = fpn_roi_align_batched(jf, jr, scales=SCALES,
                                  precision="highest", backend="sorted")
    out_e = fpn_roi_align_batched(jf, jr, scales=SCALES,
                                  precision="highest", backend="einsum")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_e),
                               rtol=1e-5, atol=1e-5)


def test_gather_rejects_adaptive_ratio():
    rng = np.random.default_rng(2)
    feats = [jnp.asarray(f) for f in _pyramid(rng, c=8, h2=32, w2=48)]
    rois = jnp.asarray(_rois(rng, n=4, img_h=128, img_w=192))
    with pytest.raises(ValueError, match="sampling_ratio"):
        fpn_roi_align(feats, rois, scales=SCALES, sampling_ratio=0,
                      backend="gather")


def test_gather_feature_gradients_match_einsum():
    """Same cotangent → same d/d features through either realization
    (both compute the same linear-in-features map)."""
    rng = np.random.default_rng(3)
    feats = _pyramid(rng, c=8, h2=32, w2=48)
    rois = jnp.asarray(_rois(rng, n=16, img_h=128, img_w=192))
    ct = jnp.asarray(
        rng.standard_normal((16, 7, 7, 8)).astype(np.float32))

    def run(backend):
        def f(*fs):
            return fpn_roi_align(list(fs), rois, scales=SCALES,
                                 precision="highest", backend=backend)
        out, vjp = jax.vjp(f, *[jnp.asarray(x) for x in feats])
        return vjp(ct)

    g_e = run("einsum")
    g_g = run("gather")
    for a, b in zip(g_g, g_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gather_bf16_close_to_f32():
    """'default' precision keeps bf16 taps with f32 accumulation —
    within bf16 rounding of the f32 result."""
    rng = np.random.default_rng(4)
    feats = _pyramid(rng, c=8, h2=32, w2=48)
    rois = jnp.asarray(_rois(rng, n=12, img_h=128, img_w=192))
    hi = fpn_roi_align([jnp.asarray(f) for f in feats], rois, scales=SCALES,
                       precision="highest", backend="gather")
    lo = fpn_roi_align([jnp.asarray(f, jnp.bfloat16) for f in feats], rois,
                       scales=SCALES, precision="default", backend="gather")
    np.testing.assert_allclose(np.asarray(lo, np.float32), np.asarray(hi),
                               rtol=0.05, atol=0.05)
