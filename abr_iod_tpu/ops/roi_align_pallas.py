"""Fused RoIAlign forward as a Pallas TPU kernel.

The XLA path (ops/roi_align.py) materializes the y-interpolated
intermediate [R, P, W, C] in HBM between its two einsums — ~600 MB per
image for the C4 shapes, pure bandwidth waste.  This kernel runs both
separable contractions back-to-back in VMEM:

  grid = (C/CB, R/RB)   (channel-block outer so the feature block stays
                         resident across the inner RoI sweep)
  per program:
    tmp  = A_y[RB*P, H] @ F[H, W*CB]          (MXU)
    out[r] = A_x[r][P, W] @ tmp[r][W, P*CB]   (MXU, per RoI in the block)

Interpolation matrices come from the same `_interp_matrix` as the XLA
path, so numerics match the CUDA-kernel semantics exactly (see
ops/roi_align.py docstring; reference csrc/cuda/ROIAlign_cuda.cu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _interp_matrix


def _kernel(feat_ref, ay_ref, ax_ref, out_ref):
    h = feat_ref.shape[0]
    w = feat_ref.shape[1]
    cb = feat_ref.shape[2]
    rb, p, _ = ay_ref.shape

    feat = feat_ref[:].reshape(h, w * cb)
    ay = ay_ref[:].reshape(rb * p, h)
    tmp = jnp.dot(ay, feat, preferred_element_type=jnp.float32)  # [RB*P, W*CB]
    tmp = tmp.reshape(rb, p, w, cb)

    # static unroll over the RoI block: Mosaic has no dynamic_slice on
    # values, and RB is small (8) so unrolling is free
    for r in range(rb):
        t = tmp[r]  # [P, W, CB]
        t2 = jnp.transpose(t, (1, 0, 2)).reshape(w, p * cb)
        o = jnp.dot(ax_ref[r], t2, preferred_element_type=jnp.float32)  # [q, p*CB]
        out_ref[r] = jnp.transpose(o.reshape(p, p, cb), (1, 0, 2))  # → [p, q, CB]


def roi_align_pallas(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    roi_block: int = 8,
    channel_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """features [H, W, C], rois [R, 4] → [R, P, P, C] (forward only)."""
    h, w, c = features.shape
    r = rois.shape[0]
    p = output_size

    start_w = rois[:, 0].astype(jnp.float32) * spatial_scale
    start_h = rois[:, 1].astype(jnp.float32) * spatial_scale
    roi_w = jnp.maximum(rois[:, 2].astype(jnp.float32) * spatial_scale - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 3].astype(jnp.float32) * spatial_scale - start_h, 1.0)
    a_y = _interp_matrix(start_h, roi_h / p, h, p, sampling_ratio, jnp.float32)
    a_x = _interp_matrix(start_w, roi_w / p, w, p, sampling_ratio, jnp.float32)

    cb = min(channel_block, c)
    while c % cb:
        cb //= 2
    rb = roi_block
    pad_r = (-r) % rb
    if pad_r:
        a_y = jnp.pad(a_y, ((0, pad_r), (0, 0), (0, 0)))
        a_x = jnp.pad(a_x, ((0, pad_r), (0, 0), (0, 0)))
    rp = r + pad_r

    out = pl.pallas_call(
        _kernel,
        grid=(c // cb, rp // rb),
        in_specs=[
            pl.BlockSpec((h, w, cb), lambda ci, ri: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, p, h), lambda ci, ri: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, p, w), lambda ci, ri: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, p, p, cb), lambda ci, ri: (ri, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, p, p, c), jnp.float32),
        interpret=interpret,
    )(features.astype(jnp.float32), a_y, a_x)
    return out[:r].astype(features.dtype)


def _bwd_kernel(g_ref, ay_ref, ax_ref, df_ref):
    """dF[h, w, cb] = Σ_r A_yᵀ[r] (Σ_q A_x[r, q, w] g[r, p, q, cb]) —
    both transposed contractions fused in VMEM, accumulated over the RoI
    grid dimension into the (channel-indexed) output block."""
    h = df_ref.shape[0]
    w = df_ref.shape[1]
    cb = df_ref.shape[2]
    rb, p, _ = ay_ref.shape
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        df_ref[:] = jnp.zeros_like(df_ref)

    acc = jnp.zeros((h, w * cb), jnp.float32)
    for r in range(rb):
        g_r = g_ref[r]  # [p, q, cb]
        gq = jnp.transpose(g_r, (1, 0, 2)).reshape(p, p * cb)  # [q, (p, cb)]
        axt = jnp.transpose(ax_ref[r], (1, 0))  # [w, q]
        t = jnp.dot(axt, gq, preferred_element_type=jnp.float32)  # [w, (p, cb)]
        tp = jnp.transpose(t.reshape(w, p, cb), (1, 0, 2)).reshape(p, w * cb)
        ayt = jnp.transpose(ay_ref[r], (1, 0))  # [h, p]
        acc = acc + jnp.dot(ayt, tp, preferred_element_type=jnp.float32)
    df_ref[:] = df_ref[:] + acc.reshape(h, w, cb)


def roi_align_pallas_bwd(g, rois, feat_shape, output_size=7,
                         spatial_scale=1.0 / 16, sampling_ratio=2,
                         roi_block: int = 8, channel_block: int = 128,
                         interpret: bool = False):
    """g [R, P, P, C], rois [R, 4] → dF [H, W, C]."""
    h, w, c = feat_shape
    r = rois.shape[0]
    p = output_size

    start_w = rois[:, 0].astype(jnp.float32) * spatial_scale
    start_h = rois[:, 1].astype(jnp.float32) * spatial_scale
    roi_w = jnp.maximum(rois[:, 2].astype(jnp.float32) * spatial_scale - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 3].astype(jnp.float32) * spatial_scale - start_h, 1.0)
    a_y = _interp_matrix(start_h, roi_h / p, h, p, sampling_ratio, jnp.float32)
    a_x = _interp_matrix(start_w, roi_w / p, w, p, sampling_ratio, jnp.float32)

    cb = min(channel_block, c)
    while c % cb:
        cb //= 2
    rb = roi_block
    pad_r = (-r) % rb
    if pad_r:
        # zero interp matrices on padded RoIs → zero contribution
        a_y = jnp.pad(a_y, ((0, pad_r), (0, 0), (0, 0)))
        a_x = jnp.pad(a_x, ((0, pad_r), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad_r), (0, 0), (0, 0), (0, 0)))
    rp = r + pad_r

    return pl.pallas_call(
        _bwd_kernel,
        grid=(c // cb, rp // rb),
        in_specs=[
            pl.BlockSpec((rb, p, p, cb), lambda ci, ri: (ri, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, p, h), lambda ci, ri: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, p, w), lambda ci, ri: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, w, cb), lambda ci, ri: (0, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.float32),
        interpret=interpret,
    )(g.astype(jnp.float32), a_y, a_x)


@functools.lru_cache(maxsize=None)
def make_roi_align_fused(output_size: int = 7, spatial_scale: float = 1.0 / 16,
                         sampling_ratio: int = 2):
    """Differentiable fused RoIAlign: Pallas forward + analytic VJP
    (dF = Σ_r A_yᵀ g_r A_x — the same transposed einsums XLA autodiff
    produces for the separable formulation)."""

    @jax.custom_vjp
    def fused(features, rois):
        return roi_align_pallas(
            features, rois, output_size, spatial_scale, sampling_ratio
        )

    def fwd(features, rois):
        return fused(features, rois), (features, rois)

    def bwd(res, g):
        features, rois = res
        df = roi_align_pallas_bwd(
            g, rois, features.shape, output_size, spatial_scale, sampling_ratio
        )
        return df.astype(features.dtype), jnp.zeros_like(rois)

    fused.defvjp(fwd, bwd)
    return fused
