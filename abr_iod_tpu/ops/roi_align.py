"""RoIAlign as a separable interpolation-matrix contraction (MXU-native).

The reference implements RoIAlign as a CUDA gather kernel
(maskrcnn_benchmark/csrc/cuda/ROIAlign_cuda.cu:15-120).  A literal port
would be a scatter/gather program — the worst possible shape for a TPU.
Instead we exploit that RoIAlign's bilinear sampling + in-bin average
pooling is *separable*: the weight of feature cell (h, w) for output bin
(ph, pw) factorizes as  A_y[ph, h] * A_x[pw, w].  So the whole op becomes
two dense contractions that run on the MXU:

    out[r, ph, pw, c] = sum_h sum_w A_y[r, ph, h] * A_x[r, pw, w] * F[h, w, c]

This is *exactly* equal (not an approximation) to the CUDA kernel's
output for static ``sampling_ratio >= 1``, including:
  * no +1 pixel convention, no coordinate rounding (cuda:82-90)
  * malformed RoIs forced to 1x1 (cuda:93-94)
  * out-of-range samples (y < -1 or y > H) contribute 0 (cuda:21-25)
  * boundary clamping of sample coordinates (cuda:27-46)

The reference's adaptive sampling (sampling_ratio=0 → ceil(roi/bin),
cuda:76-80) is data-dependent per RoI, but its grid size is bounded by
ceil(feature_size / pooled) for any image-clipped RoI — so it compiles
statically as a masked max-size grid: samples beyond each RoI's own
ceil(bin) grid carry zero weight and the in-bin average divides by the
per-RoI count.  Exact for every clipped RoI; ABR's shipped configs use
sampling_ratio=2 anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interp_matrix(start, bin_size, size: int, pooled: int, sampling_ratio: int, dtype):
    """Per-RoI 1-D interpolation/pooling matrix A[R, pooled, size].

    start:    [R] roi start coordinate (already scaled to feature cells)
    bin_size: [R] bin size in feature cells
    sampling_ratio: >= 1 static grid, or 0 = adaptive (per-RoI
    ceil(bin) grid, cuda:76-80) realized as a masked static max grid.
    """
    R = start.shape[0]
    if sampling_ratio >= 1:
        max_grid = sampling_ratio
        grid = jnp.full((R,), float(sampling_ratio), dtype)
    else:
        # adaptive: grid = ceil(roi/bin) <= ceil(size/pooled) for any
        # image-clipped RoI (+1 slack for sub-cell float edges)
        max_grid = -(-size // pooled) + 1
        grid = jnp.clip(jnp.ceil(bin_size), 1.0, float(max_grid)).astype(dtype)
    S = pooled * max_grid
    # sample coordinates: y = start + ph*bin + (iy+0.5)*bin/grid
    s_idx = jnp.arange(S, dtype=dtype)  # flattened (ph, iy)
    ph = s_idx // max_grid
    iy = s_idx % max_grid
    y = (
        start[:, None]
        + ph[None, :] * bin_size[:, None]
        + (iy[None, :] + 0.5) * bin_size[:, None] / grid[:, None]
    )  # [R, S]
    active = iy[None, :] < grid[:, None]  # adaptive: mask unused samples

    in_range = (y >= -1.0) & (y <= size)  # cuda:21-25 (empty outside)
    yc = jnp.maximum(y, 0.0)  # cuda:27-28
    y_low = jnp.floor(yc)
    # cuda:34-46: if y_low >= size-1 → y_low = y_high = size-1, frac 0
    at_edge = y_low >= size - 1
    y_low = jnp.where(at_edge, size - 1.0, y_low)
    frac = jnp.where(at_edge, 0.0, yc - y_low)
    y_high = jnp.where(at_edge, y_low, y_low + 1.0)

    cells = jnp.arange(size, dtype=dtype)[None, None, :]  # [1, 1, size]
    w = (cells == y_low[..., None]) * (1.0 - frac[..., None]) + (
        cells == y_high[..., None]
    ) * frac[..., None]
    w = jnp.where((in_range & active)[..., None], w, 0.0)  # [R, S, size]
    # fold the in-bin average (1/count per axis; total 1/(gh*gw) is separable)
    w = w.reshape(R, pooled, max_grid, size).sum(axis=2) / grid[:, None, None]
    return w.astype(dtype)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    roi_chunk: int = 128,
    precision: str = "highest",
) -> jnp.ndarray:
    """RoIAlign for a single image.

    features: [H, W, C]
    rois:     [R, 4] xyxy in image coordinates
    returns   [R, output_size, output_size, C]
    """
    H, W, C = features.shape
    R = rois.shape[0]
    dtype = jnp.float32  # interpolation matrices in f32 for exactness

    start_w = rois[:, 0].astype(dtype) * spatial_scale
    start_h = rois[:, 1].astype(dtype) * spatial_scale
    end_w = rois[:, 2].astype(dtype) * spatial_scale
    end_h = rois[:, 3].astype(dtype) * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 1.0)  # cuda:93-94
    roi_h = jnp.maximum(end_h - start_h, 1.0)
    bin_h = roi_h / output_size
    bin_w = roi_w / output_size

    a_y = _interp_matrix(start_h, bin_h, H, output_size, sampling_ratio, dtype)
    a_x = _interp_matrix(start_w, bin_w, W, output_size, sampling_ratio, dtype)

    # "highest" keeps f32 everywhere for exact parity with the CUDA
    # kernel; "default" keeps bf16 inputs IN bf16 so the [r,P,W,C]
    # intermediate costs half the HBM traffic (the MXU uses bf16 passes
    # for f32-default anyway, so numerics are ~unchanged).
    if precision == "highest" or features.dtype == jnp.float32:
        feat = features.astype(jnp.float32)
        acc_dtype = jnp.float32
    else:
        feat = features
        a_y = a_y.astype(features.dtype)
        a_x = a_x.astype(features.dtype)
        acc_dtype = features.dtype

    # Contract the LONGER feature axis first: the [r, P, ·, C]
    # intermediate then carries the shorter axis, cutting its HBM
    # traffic by the aspect ratio (e.g. 38% on the 52x84 landscape C4
    # map).  Both orders compute the same mathematical sum; float
    # associativity differs at the ulp level between them, so the
    # 'highest'-precision parity path keeps ONE fixed order regardless
    # of orientation (bit-stable across landscape/transposed canvases).
    def chunk_fn(args):
        ay, ax = args  # [r, P, H], [r, P, W]
        if W >= H and precision != "highest":
            tmp = jnp.einsum(
                "rqw,hwc->rqhc", ax, feat, precision=precision,
                preferred_element_type=acc_dtype,
            )
            out = jnp.einsum(
                "rph,rqhc->rpqc", ay, tmp, precision=precision,
                preferred_element_type=jnp.float32,
            )
        else:
            tmp = jnp.einsum(
                "rph,hwc->rpwc", ay, feat, precision=precision,
                preferred_element_type=acc_dtype,
            )
            out = jnp.einsum(
                "rqw,rpwc->rpqc", ax, tmp, precision=precision,
                preferred_element_type=jnp.float32,
            )
        return out

    if R <= roi_chunk:
        out = chunk_fn((a_y, a_x))
    else:
        pad = (-R) % roi_chunk
        a_y_p = jnp.pad(a_y, ((0, pad), (0, 0), (0, 0)))
        a_x_p = jnp.pad(a_x, ((0, pad), (0, 0), (0, 0)))
        n_chunks = (R + pad) // roi_chunk
        a_y_p = a_y_p.reshape(n_chunks, roi_chunk, output_size, H)
        a_x_p = a_x_p.reshape(n_chunks, roi_chunk, output_size, W)
        out = jax.lax.map(jax.checkpoint(chunk_fn), (a_y_p, a_x_p))
        out = out.reshape(n_chunks * roi_chunk, output_size, output_size, C)[:R]
    return out.astype(features.dtype)


def roi_align_batched(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    roi_chunk: int = 128,
    precision: str = "highest",
) -> jnp.ndarray:
    """vmapped RoIAlign: features [B,H,W,C], rois [B,R,4] → [B,R,P,P,C]."""
    fn = functools.partial(
        roi_align,
        output_size=output_size,
        spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio,
        roi_chunk=roi_chunk,
        precision=precision,
    )
    return jax.vmap(fn)(features, rois)
