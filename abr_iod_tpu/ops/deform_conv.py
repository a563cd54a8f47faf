"""Deformable convolution v1/v2 + deformable PSRoI pooling.

Reference: csrc/cuda/deform_conv_*.cu (1758 LoC of im2col-offset CUDA)
and csrc/cuda/deform_pool_*.cu, wrapped by layers/dcn/*.  The TPU-native
formulation: bilinear sampling at offset tap positions is a dense
map_coordinates gather per kernel tap, and the convolution reduces to an
einsum over taps — no im2col scratch, XLA fuses the tap loop.

Semantics (deform_conv_kernel_cuda.cu deformable_im2col):
  sample position for output (y, x), tap (i, j):
      p = (y*stride + i*dilation - pad + Δy, x*stride + j*dilation - pad + Δx)
  bilinear-sampled with zeros outside the map; v2 (modulated) multiplies
  each tap by a learned mask.

Used by DFConv2d (layers/misc.py:114-203) when STAGE_WITH_DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """img [H, W, C]; ys/xs [...]: zero-padded bilinear sampling."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = img[yc, xc]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """x [B,H,W,Cin]; offsets [B,Ho,Wo,2*Kh*Kw] ((dy,dx) per tap, the
    reference's channel order); weight [Kh,Kw,Cin,Cout]; mask
    [B,Ho,Wo,Kh*Kw] for the modulated (v2) variant."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding

    def per_image(img, off, mk):
        off = off.reshape(ho, wo, kh * kw, 2)
        cols = []
        for i in range(kh):
            for j in range(kw):
                k = i * kw + j
                ys = base_y[:, None] + i * dilation + off[:, :, k, 0]
                xs = base_x[None, :] + j * dilation + off[:, :, k, 1]
                s = _bilinear_sample(img, ys, xs)  # [Ho, Wo, Cin]
                if mk is not None:
                    s = s * mk[:, :, k : k + 1]
                cols.append(s)
        col = jnp.stack(cols, axis=2)  # [Ho, Wo, K, Cin]
        wmat = weight.reshape(kh * kw, cin, cout)
        return jnp.einsum("ywkc,kco->ywo", col, wmat,
                          preferred_element_type=jnp.float32)

    if mask is None:
        return jax.vmap(lambda i, o: per_image(i, o, None))(x, offsets)
    return jax.vmap(per_image)(x, offsets, mask)


def deform_psroi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    offsets: jnp.ndarray | None,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    trans_std: float = 0.1,
) -> jnp.ndarray:
    """Deformable (PS)RoI pooling (csrc/cuda/deform_pool_kernel_cuda.cu):
    average pooling over a sample grid whose bins are shifted by learned
    normalized offsets.  features [H,W,C]; rois [R,4];
    offsets [R, P, P, 2] or None (plain average pooling)."""
    h, w, c = features.shape
    r = rois.shape[0]
    p = output_size

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    rw = jnp.maximum(rois[:, 2] * spatial_scale - x1, 0.1)
    rh = jnp.maximum(rois[:, 3] * spatial_scale - y1, 0.1)
    bin_w = rw / p
    bin_h = rh / p

    zero_off = jnp.zeros((r, p, p, 2)) if offsets is None else offsets

    def per_roi(x1i, y1i, rwi, rhi, bwi, bhi, offi):
        py = jnp.arange(p, dtype=jnp.float32)[:, None, None]  # [P,1,1]
        px = jnp.arange(p, dtype=jnp.float32)[None, :, None]  # [1,P,1]
        s = (jnp.arange(sampling_ratio, dtype=jnp.float32) + 0.5) / sampling_ratio
        dy = offi[:, :, 0:1] * trans_std * rhi
        dx = offi[:, :, 1:2] * trans_std * rwi
        ys = y1i + py * bhi + dy + s[None, None, :] * bhi  # [P,P,S]
        xs = x1i + px * bwi + dx + s[None, None, :] * bwi
        # full S x S sample grid per bin: [P, P, S(y), S(x)]
        grid_y = jnp.broadcast_to(ys[..., :, None], ys.shape + (sampling_ratio,))
        grid_x = jnp.broadcast_to(
            xs[..., None, :], xs.shape[:-1] + (sampling_ratio, sampling_ratio)
        )
        vals = _bilinear_sample(features, grid_y, grid_x)  # [P,P,S,S,C]
        return vals.mean(axis=(2, 3))

    return jax.vmap(per_roi)(x1, y1, rw, rh, bin_w, bin_h, zero_off)
