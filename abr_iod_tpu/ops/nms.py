"""Fixed-shape greedy NMS for TPU.

The reference uses a bitmask-parallel CUDA kernel with a sequential host
pass (maskrcnn_benchmark/csrc/cuda/nms.cu:13-21 — IoU with the +1 pixel
convention).  On TPU we keep the same greedy-by-score semantics but
restructure as a *tiled suppression sweep* (the canonical TPU NMS shape,
cf. TF's non_max_suppression_padded): boxes are sorted by score, split
into tiles of 128, and each tile is (a) cross-suppressed against all
previously resolved tiles and (b) self-suppressed to a fixed point.
Everything is static-shape; the result is a keep-mask, not a ragged
index list.

The fixed point of the Jacobi iteration in (b) is exactly the greedy NMS
solution: keep[i] = not exists j<i with keep[j] and IoU(i,j) > t; each
position stabilizes after at most its chain depth, so the while_loop
terminates (typically in 2-4 sweeps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10

# Tile-sweep backend: "pallas" (or "auto": pallas on TPU, xla elsewhere)
# runs ops/nms_pallas.py — one Mosaic program instead of ~400 tiny XLA
# loop steps, 2.3x faster in isolation at the 12k-candidate pool with
# identical keep sets.  "default" resolves per call site: on C4's
# single-level path the XLA while-loop hides behind the step's async
# HBM copies (full-step A/B neutral on train, -2% eval, BASELINE.md
# round 3) so it stays xla; on the MULTI-LEVEL folded FPN sweep the
# proposal path IS the critical path and pallas wins the same-session
# real-chip A/B (fpn 41.6→45.6, fpn_abr 32.0→35.9 img/s; retinanet has
# no train NMS, neutral — BASELINE.md round 5), so multi-level callers
# get pallas on TPU.
_BACKEND = "default"  # default | auto | pallas | xla


def set_nms_backend(name: str) -> None:
    """Select the sweep backend (cfg TPU.NMS_BACKEND; trace-time)."""
    global _BACKEND
    if name not in ("default", "auto", "pallas", "xla"):
        raise ValueError(f"unknown NMS backend {name!r}")
    _BACKEND = name


def _pallas_enabled(backend: str | None, multi_level: bool = False) -> bool:
    b = _BACKEND if backend is None else backend
    if b == "default":
        return multi_level and jax.default_backend() == "tpu"
    if b == "auto":
        return jax.default_backend() == "tpu"
    return b == "pallas"


def _iou_nms(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU with the +1 convention used by the reference's NMS (nms.cu devIoU)."""
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.where(union > 0, union, 1.0)


def _self_suppress(iou_tril: jnp.ndarray, init_keep: jnp.ndarray, thresh: float):
    """Resolve within-tile greedy suppression by fixed-point iteration.

    iou_tril: [T, T] IoU, strictly lower-triangular masked (row i vs j<i).
    init_keep: [T] bool — validity / cross-tile survivors.
    """
    sup = iou_tril > thresh  # [i, j]: j can suppress i (j higher scored)

    def cond(state):
        keep, changed = state
        return changed

    def body(state):
        keep, _ = state
        # i is suppressed if any kept j<i overlaps it
        suppressed = jnp.any(sup & keep[None, :], axis=1)
        new_keep = init_keep & ~suppressed
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (init_keep, jnp.bool_(True)))
    return keep


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.7,
    max_output: int = 1000,
    tile: int = 128,
    presorted: bool = False,
    backend: str | None = None,
    multi_level: bool = False,
):
    """Greedy NMS over fixed-size padded inputs.

    boxes:  [N, 4] xyxy
    scores: [N]
    valid:  [N] bool
    presorted: caller guarantees scores are already descending (e.g. the
    proposal selector feeds lax.top_k output) — skips the O(N log N)
    re-sort; invalid entries are position-independent no-ops either way.
    Returns (indices [max_output] int32 into the ORIGINAL array,
             out_valid [max_output] bool).
    Selected boxes are in descending score order; padding slots point at
    index 0 with out_valid False.
    """
    N = boxes.shape[0]
    pad = (-N) % tile
    Np = N + pad

    b = jnp.pad(boxes, ((0, pad), (0, 0)))
    v = jnp.pad(valid, (0, pad))
    if presorted:
        order = jnp.arange(Np)
    else:
        s = jnp.where(valid, scores, NEG_INF)
        s = jnp.pad(s, (0, pad), constant_values=NEG_INF)
        order = jnp.argsort(-s)  # stable, padding sinks to the end
        b = b[order]
        v = v[order]

    if _pallas_enabled(backend, multi_level) and tile == 128:
        from .nms_pallas import nms_sweep_pallas

        keep = nms_sweep_pallas(
            b, v, iou_threshold=iou_threshold, max_output=max_output
        )
        return _select_output(keep, order, Np, max_output)

    num_tiles = Np // tile
    tril = jnp.tril(jnp.ones((tile, tile), dtype=bool), k=-1)

    # Survivor-buffer sweep: each tile cross-suppresses against the dense
    # buffer of boxes KEPT so far, capped at max_output slots.  The cap is
    # exact, not approximate: a box whose final rank is <= max_output can
    # only be suppressed by higher-scored keeps, all of which have rank
    # below its own and therefore fit in the buffer; keeps beyond the cap
    # only influence boxes that are truncated from the output anyway.
    # This turns the O(num_tiles^2/2) all-previous-tiles sweep into
    # O(num_tiles * cap/tile) — the win that makes the reference's
    # 12000-candidate pre-NMS pool affordable (cap 2000: 16 buffer tiles
    # vs up to 94 previous tiles).
    cap = max(-(-max_output // tile), 1) * tile
    buf_tiles = cap // tile

    def outer(i, state):
        keep, buf_boxes, buf_count = state
        tile_boxes = jax.lax.dynamic_slice(b, (i * tile, 0), (tile, 4))
        tile_keep = jax.lax.dynamic_slice(v, (i * tile,), (tile,))

        def cross(j, tk):
            other_boxes = jax.lax.dynamic_slice(buf_boxes, (j * tile, 0), (tile, 4))
            other_keep = (j * tile + jnp.arange(tile)) < buf_count
            iou = _iou_nms(tile_boxes, other_boxes)
            suppressed = jnp.any((iou > iou_threshold) & other_keep[None, :], axis=1)
            return tk & ~suppressed

        tile_keep = jax.lax.fori_loop(0, buf_tiles, cross, tile_keep)
        iou_self = jnp.where(tril, _iou_nms(tile_boxes, tile_boxes), 0.0)
        tile_keep = _self_suppress(iou_self, tile_keep, iou_threshold)

        # append this tile's keeps densely onto the buffer (overflow drops)
        slot = jnp.where(
            tile_keep,
            buf_count + jnp.cumsum(tile_keep.astype(jnp.int32)) - 1,
            cap,
        )
        buf_boxes = buf_boxes.at[slot].set(tile_boxes, mode="drop")
        buf_count = jnp.minimum(
            buf_count + jnp.sum(tile_keep.astype(jnp.int32)), cap
        )
        keep = jax.lax.dynamic_update_slice(keep, tile_keep, (i * tile,))
        return keep, buf_boxes, buf_count

    keep, _, _ = jax.lax.fori_loop(
        0, num_tiles, outer,
        (jnp.zeros((Np,), dtype=bool), jnp.zeros((cap, 4), b.dtype),
         jnp.int32(0)),
    )

    return _select_output(keep, order, Np, max_output)


def _select_output(keep, order, Np: int, max_output: int):
    # fixed-size selection: kept boxes, already in descending score order
    rank = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, Np)
    # non-kept and overflow slots get rank >= max_output → dropped by scatter
    orig_idx = order.astype(jnp.int32)
    out_idx = (
        jnp.zeros((max_output,), dtype=jnp.int32).at[rank].set(orig_idx, mode="drop")
    )
    total = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_output)
    out_valid = jnp.arange(max_output) < total
    return out_idx, out_valid
