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


def _axis_samples(start, bin_size, size, pooled: int, sampling_ratio: int):
    """Per-sample 1-D bilinear taps for the gather formulation.

    Same semantics as ``_interp_matrix`` (reference ROIAlign_cuda.cu:21-46)
    expressed as explicit (index, weight) pairs instead of a dense [S, size]
    matrix.  ``size`` may be a per-RoI array (multi-level pooling, where
    each RoI samples its assigned pyramid level's map).

    start, bin_size: [R] f32 (feature-cell coordinates)
    size:            int or [R] f32/int
    returns idx_low, idx_high [R, S] int32 and w_low, w_high [R, S] f32
    with S = pooled * sampling_ratio; out-of-range samples carry weight 0
    and an in-bounds (clamped) index.
    """
    if sampling_ratio < 1:
        raise ValueError(
            "gather RoIAlign requires a static sampling_ratio >= 1 "
            "(adaptive ratio 0 is served by the interp-matrix path)")
    f32 = jnp.float32
    size = jnp.asarray(size, f32)
    if size.ndim == 0:
        size = jnp.broadcast_to(size, start.shape)
    S = pooled * sampling_ratio
    s_idx = jnp.arange(S, dtype=f32)
    ph = s_idx // sampling_ratio
    iy = s_idx % sampling_ratio
    y = (
        start[:, None]
        + ph[None, :] * bin_size[:, None]
        + (iy[None, :] + 0.5) * bin_size[:, None] / sampling_ratio
    )  # [R, S]
    in_range = (y >= -1.0) & (y <= size[:, None])  # cuda:21-25
    yc = jnp.maximum(y, 0.0)  # cuda:27-28
    y_low = jnp.floor(yc)
    at_edge = y_low >= size[:, None] - 1.0  # cuda:34-46
    y_low = jnp.where(at_edge, size[:, None] - 1.0, y_low)
    frac = jnp.where(at_edge, 0.0, yc - y_low)
    y_high = jnp.where(at_edge, y_low, y_low + 1.0)
    w_low = jnp.where(in_range, 1.0 - frac, 0.0)
    w_high = jnp.where(in_range, frac, 0.0)
    return (
        y_low.astype(jnp.int32),
        y_high.astype(jnp.int32),
        w_low,
        w_high,
    )


def multilevel_roi_align_einsum(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int = 7,
    scales=(0.25, 0.125, 0.0625, 0.03125),
    sampling_ratio: int = 2,
    precision: str = "default",
) -> jnp.ndarray:
    """Multi-level RoIAlign, dense-contraction realization: pool every
    RoI from every level with the interpolation-matrix einsums, select
    by level assignment with a static L-way where.  Linear in
    ``features`` for fixed (rois, levels) — ``jax.linear_transpose`` of
    this function is the exact features-adjoint the gather backend's
    custom VJP uses."""
    pooled = [
        roi_align(f, rois, output_size=output_size, spatial_scale=s,
                  sampling_ratio=sampling_ratio, precision=precision)
        for f, s in zip(features, scales)
    ]
    out = pooled[0]
    for i in range(1, len(pooled)):
        out = jnp.where((levels == i)[:, None, None, None], pooled[i], out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def multilevel_roi_align_gather(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int = 7,
    scales=(0.25, 0.125, 0.0625, 0.03125),
    sampling_ratio: int = 2,
    precision: str = "default",
) -> jnp.ndarray:
    """Multi-level RoIAlign as one flat gather (single image).

    The separable-einsum formulation (``roi_align``) contracts dense
    [S, H]/[S, W] interpolation matrices against the WHOLE feature map —
    near-optimal on the C4 res4 map (52x84, C=1024) but on an FPN
    pyramid the P2 map alone is 208x336 and the matrices are ~99.5%
    zeros: the step profile attributes ~35% of the FPN train step to
    these einsums.  Here each RoI instead gathers only its P*P * g*g * 4
    bilinear corner taps, and only from its ASSIGNED level — the
    reference's own structure (poolers.py Pooler.__call__: per-level
    index_select on the LevelMapper assignment), so the cost is
    O(R * P^2 * g^2 * C), independent of map area and level count.

    features: list of [H_l, W_l, C] maps (P2..P5)
    rois:     [R, 4] xyxy image coordinates
    levels:   [R] int32 in [0, len(features)) — the LevelMapper output
    returns   [R, P, P, C]; equals the pool-all-levels-then-select
    einsum path to f32 rounding (tests/test_fpn_gather.py).

    Gradients: features-only, via the linear transpose of the einsum
    realization (dense adjoint — the AD scatter-add of the gather was
    measured 2x slower than the whole einsum step on TPU).  rois and
    levels get zero gradient, exactly like the reference CUDA kernel
    (ROIAlign_cuda.cu backward emits grad_input only); every train path
    stop_gradients its rois anyway (engine/fpn.py:150).
    """
    L = len(features)
    C = features[0].shape[-1]
    R = rois.shape[0]
    P = output_size
    g = sampling_ratio
    f32 = jnp.float32

    sizes_h = jnp.asarray([f.shape[0] for f in features], f32)
    sizes_w = jnp.asarray([f.shape[1] for f in features], f32)
    cells = jnp.asarray([f.shape[0] * f.shape[1] for f in features])
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(cells).astype(jnp.int32)[:-1]])
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)

    lvl = jnp.clip(levels, 0, L - 1)
    scale = jnp.take(jnp.asarray(scales, f32), lvl)
    H_r = jnp.take(sizes_h, lvl)
    W_r = jnp.take(sizes_w, lvl)
    off_r = jnp.take(offsets, lvl)

    start_w = rois[:, 0].astype(f32) * scale
    start_h = rois[:, 1].astype(f32) * scale
    end_w = rois[:, 2].astype(f32) * scale
    end_h = rois[:, 3].astype(f32) * scale
    roi_w = jnp.maximum(end_w - start_w, 1.0)  # cuda:93-94
    roi_h = jnp.maximum(end_h - start_h, 1.0)
    bin_h = roi_h / P
    bin_w = roi_w / P

    yl, yh, wyl, wyh = _axis_samples(start_h, bin_h, H_r, P, g)
    xl, xh, wxl, wxh = _axis_samples(start_w, bin_w, W_r, P, g)

    w_stride = W_r.astype(jnp.int32)
    if precision == "highest" or flat.dtype == jnp.float32:
        src = flat.astype(f32)
    else:
        src = flat  # bf16 taps, f32 accumulation below

    def corner(yi, xi, wy, wx):
        idx = (off_r[:, None, None] + yi[:, :, None] * w_stride[:, None, None]
               + xi[:, None, :])  # [R, S, S]
        v = jnp.take(src, idx.reshape(R, -1), axis=0)  # [R, S*S, C]
        w = (wy[:, :, None] * wx[:, None, :]).reshape(R, -1)
        return v.astype(f32) * w[..., None]

    acc = (corner(yl, xl, wyl, wxl) + corner(yl, xh, wyl, wxh)
           + corner(yh, xl, wyh, wxl) + corner(yh, xh, wyh, wxh))
    acc = acc.reshape(R, P, g, P, g, C).sum(axis=(2, 4)) / (g * g)
    return acc.astype(features[0].dtype)


def _mlra_gather_fwd(features, rois, levels, output_size, scales,
                     sampling_ratio, precision):
    out = multilevel_roi_align_gather(
        features, rois, levels, output_size, scales, sampling_ratio,
        precision)
    meta = [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in features]
    return out, (meta, rois, levels)


def _mlra_gather_bwd(output_size, scales, sampling_ratio, precision,
                     res, g):
    import numpy as np

    meta, rois, levels = res

    def lin(feats):
        return multilevel_roi_align_einsum(
            feats, rois, levels, output_size=output_size, scales=scales,
            sampling_ratio=sampling_ratio, precision=precision)

    (d_feats,) = jax.linear_transpose(lin, list(meta))(g)
    d_rois = jnp.zeros_like(rois)
    d_levels = np.zeros(levels.shape, jax.dtypes.float0)
    return (d_feats, d_rois, d_levels)


multilevel_roi_align_gather.defvjp(_mlra_gather_fwd, _mlra_gather_bwd)


def multilevel_roi_align_sorted(
    features,
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int = 7,
    scales=(0.25, 0.125, 0.0625, 0.03125),
    sampling_ratio: int = 2,
    precision: str = "default",
    chunk: int = 128,
) -> jnp.ndarray:
    """Multi-level RoIAlign, BATCHED, with sorted conditional level skip.

    The plain einsum realization pools every RoI from every level — 4x
    the assigned work, and on an FPN pyramid the per-level contraction
    cost scales with map area (P2 is 208x336).  A per-RoI gather of the
    bilinear taps is the FLOP-minimal alternative but XLA's TPU row
    gathers/scatters measured ~40 GB/s (BASELINE.md round 5) — slower
    than the dense einsums they replace.  This realization keeps the
    MXU einsums but skips the wasted (chunk, level) pairs:

      1. stable-sort each image's RoIs by assigned level;
      2. split the sorted axis into static chunks;
      3. for each (chunk, level): one BATCH-UNIFORM `lax.cond` — the
         dense einsum against that level runs only if ANY image has a
         RoI of that level in the chunk.  Sorting makes chunks
         level-pure, so typically ~L+chunks-1 of the L*chunks pairs
         execute; the worst case equals the plain einsum path.
      4. unsort.

    The predicate is uniform over the batch (scalar `jnp.any`), so the
    cond survives jit as a real TPU conditional instead of degrading to
    a both-branches select — which is why this entry point is BATCHED
    and must not be called under vmap.  Within an executed pair,
    non-member RoIs contribute exact zeros (masked interpolation rows),
    so outputs match the plain einsum path to float rounding
    (tests/test_fpn_gather.py); AD transposes the conds, so the
    backward skips the same pairs.

    features: list of [B, H_l, W_l, C]; rois [B, R, 4]; levels [B, R].
    Returns [B, R, P, P, C].
    """
    L = len(features)
    B, R = rois.shape[:2]
    P = output_size
    f32 = jnp.float32
    dtype = features[0].dtype

    order = jnp.argsort(levels, axis=1, stable=True)
    inv = jnp.argsort(order, axis=1, stable=True)
    rois_s = jnp.take_along_axis(rois, order[..., None], axis=1)
    lvl_s = jnp.take_along_axis(levels, order, axis=1)

    chunk = max(1, min(chunk, R))
    pad = (-R) % chunk
    if pad:
        rois_s = jnp.pad(rois_s, ((0, 0), (0, pad), (0, 0)))
        lvl_s = jnp.pad(lvl_s, ((0, 0), (0, pad)), constant_values=-1)
    n_chunks = (R + pad) // chunk

    def pooled_chunk_level(rois_c, member, feat, scale):
        """Masked batched separable RoIAlign of one chunk vs one level.
        rois_c [B,K,4], member [B,K] bool, feat [B,H,W,C]."""
        K = rois_c.shape[1]
        H, W, C = feat.shape[1:]
        start_w = rois_c[..., 0].astype(f32) * scale
        start_h = rois_c[..., 1].astype(f32) * scale
        roi_w = jnp.maximum(rois_c[..., 2].astype(f32) * scale - start_w, 1.0)
        roi_h = jnp.maximum(rois_c[..., 3].astype(f32) * scale - start_h, 1.0)
        bin_h = (roi_h / P).reshape(-1)
        bin_w = (roi_w / P).reshape(-1)
        a_y = _interp_matrix(start_h.reshape(-1), bin_h, H, P,
                             sampling_ratio, f32).reshape(B, K, P, H)
        a_x = _interp_matrix(start_w.reshape(-1), bin_w, W, P,
                             sampling_ratio, f32).reshape(B, K, P, W)
        a_y = jnp.where(member[:, :, None, None], a_y, 0.0)
        if precision == "highest" or feat.dtype == jnp.float32:
            f = feat.astype(f32)
            acc = f32
        else:
            f = feat
            a_y = a_y.astype(feat.dtype)
            a_x = a_x.astype(feat.dtype)
            acc = feat.dtype
        # contract the longer feature axis first (see roi_align above)
        if W >= H and precision != "highest":
            tmp = jnp.einsum("bkqw,bhwc->bkqhc", a_x, f,
                             precision=precision, preferred_element_type=acc)
            out = jnp.einsum("bkph,bkqhc->bkpqc", a_y, tmp,
                             precision=precision,
                             preferred_element_type=jnp.float32)
        else:
            tmp = jnp.einsum("bkph,bhwc->bkpwc", a_y, f,
                             precision=precision, preferred_element_type=acc)
            out = jnp.einsum("bkqw,bkpwc->bkpqc", a_x, tmp,
                             precision=precision,
                             preferred_element_type=jnp.float32)
        return out.astype(dtype)

    outs = []
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        rois_c = rois_s[:, sl]
        lvl_c = lvl_s[:, sl]
        out_c = jnp.zeros((B, rois_c.shape[1], P, P, features[0].shape[-1]),
                          dtype)
        for l in range(L):
            member = lvl_c == l
            pooled_l = jax.checkpoint(
                functools.partial(pooled_chunk_level, scale=float(scales[l])))
            zeros_l = functools.partial(
                lambda rc, m, ft, z: jnp.zeros(z, dtype),
                z=out_c.shape)
            out_c = out_c + jax.lax.cond(
                jnp.any(member), pooled_l, zeros_l,
                rois_c, member, features[l],
            )
        outs.append(out_c)
    out_s = jnp.concatenate(outs, axis=1)[:, :R]
    return jnp.take_along_axis(
        out_s, inv[..., None, None, None], axis=1)
