import numpy as np
import jax.numpy as jnp

from abr_iod_tpu.ops.roi_pool import roi_pool


def roi_pool_numpy(features, rois, output_size, spatial_scale):
    """Oracle mirroring csrc/cuda/ROIPool_cuda.cu:16-77."""
    h, w, c = features.shape
    r = rois.shape[0]
    p = output_size
    out = np.zeros((r, p, p, c), np.float32)
    for n in range(r):
        sw = int(round(rois[n, 0] * spatial_scale))
        sh = int(round(rois[n, 1] * spatial_scale))
        ew = int(round(rois[n, 2] * spatial_scale))
        eh = int(round(rois[n, 3] * spatial_scale))
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        bh, bw = rh / p, rw / p
        for ph in range(p):
            for pw in range(p):
                hstart = min(max(int(np.floor(ph * bh)) + sh, 0), h)
                hend = min(max(int(np.ceil((ph + 1) * bh)) + sh, 0), h)
                wstart = min(max(int(np.floor(pw * bw)) + sw, 0), w)
                wend = min(max(int(np.ceil((pw + 1) * bw)) + sw, 0), w)
                if hend <= hstart or wend <= wstart:
                    out[n, ph, pw] = 0.0
                else:
                    out[n, ph, pw] = features[hstart:hend, wstart:wend].max(axis=(0, 1))
    return out


def test_roi_pool_matches_cuda_semantics(rng):
    feats = rng.randn(20, 28, 3).astype(np.float32)
    x1 = rng.uniform(0, 300, 10)
    y1 = rng.uniform(0, 220, 10)
    rois = np.stack([x1, y1, x1 + rng.uniform(16, 150, 10),
                     y1 + rng.uniform(16, 100, 10)], 1).astype(np.float32)
    got = np.asarray(roi_pool(jnp.asarray(feats), jnp.asarray(rois), 7, 1 / 16))
    ref = roi_pool_numpy(feats, rois, 7, 1 / 16)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_roi_pool_out_of_range_and_tiny(rng):
    feats = rng.randn(8, 8, 2).astype(np.float32)
    rois = np.array(
        [[200.0, 200.0, 400.0, 400.0], [0.0, 0.0, 4.0, 4.0]], np.float32
    )
    got = np.asarray(roi_pool(jnp.asarray(feats), jnp.asarray(rois), 4, 1 / 16))
    ref = roi_pool_numpy(feats, rois, 4, 1 / 16)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
