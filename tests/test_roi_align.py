import numpy as np
import jax
import jax.numpy as jnp

from abr_iod_tpu.ops.roi_align import roi_align, roi_align_batched
from tests.oracles import roi_align_numpy


def _rois(rng, n, h, w, scale):
    x1 = rng.uniform(0, w / scale * 0.8, n)
    y1 = rng.uniform(0, h / scale * 0.8, n)
    bw = rng.uniform(1, w / scale * 0.5, n)
    bh = rng.uniform(1, h / scale * 0.5, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)


def test_roi_align_matches_cuda_semantics(rng):
    h, w, c = 24, 32, 3
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = _rois(rng, 12, h, w, 1.0 / 16)
    got = roi_align(jnp.asarray(feats), jnp.asarray(rois), 7, 1.0 / 16, 2)
    ref = roi_align_numpy(feats, rois, 7, 1.0 / 16, 2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_roi_align_malformed_and_boundary(rng):
    h, w, c = 16, 16, 2
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = np.array(
        [
            [50.0, 50.0, 50.0, 50.0],  # zero-size → forced 1x1
            [-30.0, -30.0, -10.0, -10.0],  # fully out of range
            [0.0, 0.0, 255.0, 255.0],  # whole image
            [250.0, 250.0, 400.0, 400.0],  # straddles the edge
        ],
        dtype=np.float32,
    )
    got = roi_align(jnp.asarray(feats), jnp.asarray(rois), 7, 1.0 / 16, 2)
    ref = roi_align_numpy(feats, rois, 7, 1.0 / 16, 2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_roi_align_chunked_equals_unchunked(rng):
    h, w, c = 16, 20, 4
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = _rois(rng, 70, h, w, 1.0 / 16)
    a = roi_align(jnp.asarray(feats), jnp.asarray(rois), 7, 1.0 / 16, 2, roi_chunk=32)
    b = roi_align(jnp.asarray(feats), jnp.asarray(rois), 7, 1.0 / 16, 2, roi_chunk=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_roi_align_batched_shape(rng):
    feats = rng.randn(2, 16, 16, 4).astype(np.float32)
    rois = np.stack([_rois(rng, 8, 16, 16, 1.0 / 16) for _ in range(2)])
    out = roi_align_batched(jnp.asarray(feats), jnp.asarray(rois), 7, 1.0 / 16, 2)
    assert out.shape == (2, 8, 7, 7, 4)
    ref0 = roi_align_numpy(feats[0], rois[0], 7, 1.0 / 16, 2)
    np.testing.assert_allclose(np.asarray(out[0]), ref0, rtol=1e-4, atol=1e-4)


def test_roi_align_grad_flows(rng):
    feats = jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))
    rois = jnp.asarray(_rois(rng, 4, 8, 8, 1.0 / 16))

    def f(x):
        return jnp.sum(roi_align(x, rois, 3, 1.0 / 16, 2) ** 2)

    g = jax.grad(f)(feats)
    assert g.shape == feats.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_roi_align_adaptive_sampling_matches_oracle(rng):
    """sampling_ratio=0 (adaptive per-RoI ceil(bin) grid, reference
    ROIAlign_cuda.cu:76-80) — realized as a masked static max grid; must
    match the CPU-kernel oracle exactly (round-2 verdict missing #6)."""
    H, W, C = 24, 32, 5
    feat = rng.randn(H, W, C).astype(np.float32)
    rois = np.array([
        [0.0, 0.0, 500.0, 380.0],    # whole image (grid ~4x5 after clip)
        [16.0, 8.0, 160.0, 120.0],   # mid box, grid ceil varies per axis
        [4.0, 4.0, 18.0, 18.0],      # tiny box -> grid 1
        [100.0, 90.0, 101.0, 91.0],  # degenerate -> 1x1 rule
    ], np.float32)
    got = np.asarray(roi_align(
        jnp.asarray(feat), jnp.asarray(rois), output_size=7,
        spatial_scale=1.0 / 16, sampling_ratio=0, precision="highest",
    ))
    ref = roi_align_numpy(feat, rois, 7, 1.0 / 16, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
