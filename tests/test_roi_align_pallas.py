"""Pallas fused RoIAlign vs the XLA/oracle implementations
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.ops.roi_align import roi_align
from abr_iod_tpu.ops.roi_align_pallas import make_roi_align_fused, roi_align_pallas
from tests.oracles import roi_align_numpy


def _rois(rng, n, scale_extent):
    x1 = rng.uniform(0, scale_extent * 0.7, n)
    y1 = rng.uniform(0, scale_extent * 0.7, n)
    return np.stack(
        [x1, y1, x1 + rng.uniform(8, scale_extent * 0.5, n),
         y1 + rng.uniform(8, scale_extent * 0.5, n)], 1
    ).astype(np.float32)


def test_pallas_matches_oracle(rng):
    h, w, c = 16, 24, 8
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = _rois(rng, 10, 256)
    got = np.asarray(
        roi_align_pallas(jnp.asarray(feats), jnp.asarray(rois), 7, 1 / 16, 2,
                         roi_block=4, channel_block=8, interpret=True)
    )
    ref = roi_align_numpy(feats, rois, 7, 1 / 16, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_matches_xla_path(rng):
    h, w, c = 12, 20, 4
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = _rois(rng, 9, 200)  # forces roi padding (9 % 4 != 0)
    got = np.asarray(
        roi_align_pallas(jnp.asarray(feats), jnp.asarray(rois), 5, 1 / 16, 2,
                         roi_block=4, channel_block=4, interpret=True)
    )
    ref = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois), 5, 1 / 16, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_vjp_matches_xla_grad(rng):
    h, w, c = 10, 12, 4
    feats = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    rois = jnp.asarray(_rois(rng, 4, 120))

    def loss_xla(f):
        return jnp.sum(roi_align(f, rois, 3, 1 / 16, 2) ** 2)

    g_xla = jax.grad(loss_xla)(feats)

    # custom VJP with the interpret-mode forward
    from abr_iod_tpu.ops.roi_align_pallas import roi_align_pallas as rap
    from abr_iod_tpu.ops.roi_align import _interp_matrix

    fused = make_roi_align_fused(3, 1 / 16, 2)

    def loss_fused(f):
        out = rap(f, rois, 3, 1 / 16, 2, roi_block=4, channel_block=4,
                  interpret=True)
        return jnp.sum(out ** 2)

    # numeric check of the analytic VJP via the closed-form formula
    out = rap(feats, rois, 3, 1 / 16, 2, roi_block=4, channel_block=4,
              interpret=True)
    g = 2 * out
    start_w = rois[:, 0] / 16
    start_h = rois[:, 1] / 16
    rw = jnp.maximum(rois[:, 2] / 16 - start_w, 1.0)
    rh = jnp.maximum(rois[:, 3] / 16 - start_h, 1.0)
    ay = _interp_matrix(start_h, rh / 3, h, 3, 2, jnp.float32)
    ax = _interp_matrix(start_w, rw / 3, w, 3, 2, jnp.float32)
    t = jnp.einsum("rqw,rpqc->rpwc", ax, g)
    df = jnp.einsum("rph,rpwc->hwc", ay, t)
    np.testing.assert_allclose(np.asarray(df), np.asarray(g_xla), rtol=1e-3,
                               atol=1e-4)


def test_pallas_bwd_kernel_matches_xla_grad(rng):
    from abr_iod_tpu.ops.roi_align_pallas import roi_align_pallas_bwd

    h, w, c = 10, 12, 8
    feats = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    rois = jnp.asarray(_rois(rng, 5, 120))  # 5 % 4 != 0 → roi padding path
    g = jnp.asarray(rng.randn(5, 3, 3, c).astype(np.float32))

    def loss_xla(f):
        return jnp.sum(roi_align(f, rois, 3, 1 / 16, 2) * g)

    g_xla = jax.grad(loss_xla)(feats)
    df = roi_align_pallas_bwd(g, rois, (h, w, c), 3, 1 / 16, 2,
                              roi_block=4, channel_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(df), np.asarray(g_xla),
                               rtol=1e-3, atol=1e-4)
