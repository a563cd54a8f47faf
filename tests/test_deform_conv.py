import numpy as np
import jax.numpy as jnp

from abr_iod_tpu.ops.deform_conv import deform_conv2d, deform_psroi_pool


def _naive_deform_conv(x, offsets, weight, mask, stride, padding, dilation):
    """Straight-from-the-definition oracle (deformable_im2col semantics)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((b, ho, wo, cout))

    def sample(img, y, x_):
        if y < -1 + 1e-9 or y > img.shape[0] or x_ < -1 + 1e-9 or x_ > img.shape[1]:
            pass
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        fy, fx = y - y0, x_ - x0
        v = np.zeros(img.shape[2])
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                    v += wy * wx * img[yy, xx]
        return v

    for n in range(b):
        for oy in range(ho):
            for ox in range(wo):
                acc = np.zeros(cout)
                off = offsets[n, oy, ox].reshape(kh * kw, 2)
                for i in range(kh):
                    for j in range(kw):
                        k = i * kw + j
                        y = oy * stride - padding + i * dilation + off[k, 0]
                        x_ = ox * stride - padding + j * dilation + off[k, 1]
                        s = sample(x[n], y, x_)
                        if mask is not None:
                            s = s * mask[n, oy, ox, k]
                        acc += s @ weight[i, j]
                out[n, oy, ox] = acc
    return out


def test_deform_conv_zero_offsets_equals_conv(rng):
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    off = np.zeros((1, 8, 8, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w)))
    # plain conv oracle via scipy-style loops
    ref = _naive_deform_conv(x, off, w, None, 1, 1, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_deform_conv_random_offsets_and_mask(rng):
    x = rng.randn(2, 6, 7, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 3).astype(np.float32)
    off = (rng.randn(2, 6, 7, 18) * 1.5).astype(np.float32)
    mask = rng.rand(2, 6, 7, 9).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                      jnp.asarray(mask))
    )
    ref = _naive_deform_conv(x, off, w, mask, 1, 1, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_deform_conv_stride2(rng):
    x = rng.randn(1, 9, 9, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 2).astype(np.float32)
    off = (rng.randn(1, 5, 5, 18) * 0.7).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w), stride=2)
    )
    ref = _naive_deform_conv(x, off, w, None, 2, 1, 1)
    assert got.shape == (1, 5, 5, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_deform_psroi_pool_shapes(rng):
    feats = jnp.asarray(rng.randn(16, 16, 4).astype(np.float32))
    rois = jnp.asarray(np.array([[16.0, 16.0, 128.0, 128.0]], np.float32))
    out0 = deform_psroi_pool(feats, rois, None, output_size=3)
    assert out0.shape == (1, 3, 3, 4)
    off = jnp.asarray(rng.randn(1, 3, 3, 2).astype(np.float32))
    out1 = deform_psroi_pool(feats, rois, off, output_size=3)
    assert out1.shape == (1, 3, 3, 4)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
