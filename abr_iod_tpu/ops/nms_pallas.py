"""Pallas TPU kernel for the greedy NMS tile sweep.

The XLA formulation (ops/nms.py) is exact but latency-bound: at the
reference's 12000-candidate pre-NMS pool it runs ~400 tiny sequential
`lax.while_loop`/`fori_loop` steps per image, each paying XLA loop
overhead for microseconds of VPU work (~10 ms/iter of the flagship step,
round-3 xplane profile).  This kernel runs the ENTIRE sweep as one
Mosaic program: all state lives in VMEM, loop steps are machine loops
with no dispatch overhead, and within-tile greedy resolution becomes a
Jacobi fixed point whose sweep is a single 128x128 matvec on the MXU.

Semantics are identical to ops/nms.py (greedy-by-score NMS, IoU with the
reference's +1 pixel convention, maskrcnn_benchmark/csrc/cuda/nms.cu
devIoU), with one output-invariant shortcut: once `max_output` boxes
have been kept, remaining tiles are skipped under `pl.when` — a box
beyond the cap can never appear in the truncated output, and a skipped
tile's keep stays False so it suppresses nobody.

Layout notes (why the shapes look the way they do):
  * All persistent state is ROW-major ([1, Np] / [4, Np]): a [Np, 1]
    column array would pad its lane dimension to 128 in VMEM (6 MB for
    the 12k pool).  Row arrays pad sublanes to 8 — 385 KB.
  * Per-tile IoU is computed as [T_i sublanes, T_j lanes]; the i-side
    needs column vectors, produced by ~5 tiny [1,128]->[128,1]
    transposes per OUTER tile (never in the inner tile-pair loop).
  * Within-tile greedy: keep = valid & ~(sup_tril @ keep > 0) iterated
    to fixed point — each sweep is one MXU matvec; a bounded fori with a
    converged flag replaces `lax.while_loop` (sequential suppression
    chains settle one rank per sweep, so T sweeps are always enough, and
    the convergence predicate makes the typical cost 3-4 sweeps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _tile_cols(boxes_r_ref, t):
    """Tile t's coordinates as [T,1] columns + [T,1] area (+1 convention)."""
    x1 = boxes_r_ref[0:1, pl.ds(t * TILE, TILE)].T  # [T,1]
    y1 = boxes_r_ref[1:2, pl.ds(t * TILE, TILE)].T
    x2 = boxes_r_ref[2:3, pl.ds(t * TILE, TILE)].T
    y2 = boxes_r_ref[3:4, pl.ds(t * TILE, TILE)].T
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    return x1, y1, x2, y2, area


def _tile_rows(boxes_r_ref, t):
    """Tile t's coordinates as [1,T] rows + [1,T] area."""
    x1 = boxes_r_ref[0:1, pl.ds(t * TILE, TILE)]
    y1 = boxes_r_ref[1:2, pl.ds(t * TILE, TILE)]
    x2 = boxes_r_ref[2:3, pl.ds(t * TILE, TILE)]
    y2 = boxes_r_ref[3:4, pl.ds(t * TILE, TILE)]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    return x1, y1, x2, y2, area


def _iou_cols_rows(cols, rows):
    """IoU [T_i, T_j] between column-layout tile i and row-layout tile j.

    Division (not the inter > t*union trick) so the comparison is
    bit-compatible with ops/nms.py's XLA path and the reference kernel.
    """
    x1i, y1i, x2i, y2i, ai = cols
    x1j, y1j, x2j, y2j, aj = rows
    w = jnp.clip(jnp.minimum(x2i, x2j) - jnp.maximum(x1i, x1j) + 1.0, 0.0, None)
    h = jnp.clip(jnp.minimum(y2i, y2j) - jnp.maximum(y1i, y1j) + 1.0, 0.0, None)
    inter = w * h  # [T, T]
    union = ai + aj - inter
    return inter / jnp.where(union > 0, union, 1.0)


def _nms_sweep_kernel(
    boxes_r_ref, valid_ref, keep_ref, cnt_ref, *, num_tiles, thresh, max_output
):
    """boxes_r [4, Np] f32, valid [1, Np] f32 -> keep [1, Np] f32."""
    keep_ref[:, :] = jnp.zeros_like(keep_ref)
    cnt_ref[0, 0] = jnp.int32(0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    tril = (col_ids < row_ids).astype(jnp.float32)  # j<i can suppress i

    def tile_body(t, _):
        @pl.when(cnt_ref[0, 0] < max_output)
        def _():
            cols = _tile_cols(boxes_r_ref, t)

            # cross-suppression vs all previously resolved tiles (j < t):
            # sup_i accumulates as a [T,1] column through the inner loop
            def cross(j, sup):
                rows = _tile_rows(boxes_r_ref, j)
                iou = _iou_cols_rows(cols, rows)
                keep_j = keep_ref[0:1, pl.ds(j * TILE, TILE)]  # [1,T]
                hit = jnp.where((iou > thresh) & (keep_j > 0.5), 1.0, 0.0)
                return jnp.maximum(sup, jnp.max(hit, axis=1, keepdims=True))

            sup = jax.lax.fori_loop(
                0, t, cross, jnp.zeros((TILE, 1), jnp.float32)
            )

            # within-tile greedy via Jacobi fixed point on the MXU:
            # keep = init & ~(sup_tril @ keep > 0); one rank settles per
            # sweep at worst, so TILE sweeps always suffice; converged
            # sweeps are predicated away (typical chains: 3-4 sweeps).
            rows_t = _tile_rows(boxes_r_ref, t)
            iou_self = _iou_cols_rows(cols, rows_t)
            sup_mat = jnp.where(iou_self > thresh, 1.0, 0.0) * tril  # [T,T]
            valid_col = valid_ref[0:1, pl.ds(t * TILE, TILE)].T  # [T,1]
            init_keep = valid_col * (1.0 - sup)

            def sweep(_, state):
                keep, done = state

                def advance(args):
                    keep, _ = args
                    hit = jnp.dot(
                        sup_mat, keep, preferred_element_type=jnp.float32
                    )
                    new = init_keep * jnp.where(hit > 0.5, 0.0, 1.0)
                    changed = jnp.any(new != keep)
                    return new, jnp.logical_not(changed)

                return jax.lax.cond(
                    done, lambda a: a, advance, (keep, done)
                )

            keep_col, _ = jax.lax.fori_loop(
                0, TILE, sweep, (init_keep, jnp.bool_(False))
            )

            keep_ref[0:1, pl.ds(t * TILE, TILE)] = keep_col.T
            cnt_ref[0, 0] += jnp.sum(keep_col).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_output", "interpret")
)
def nms_sweep_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask over score-DESCENDING boxes.

    boxes [Np, 4] f32 (Np % 128 == 0), valid [Np] bool -> keep [Np] bool.
    Greedy semantics identical to the ops/nms.py sweep; keeps beyond
    `max_output` may be dropped (they never reach the truncated output).
    """
    n = boxes.shape[0]
    assert n % TILE == 0, n
    boxes_r = boxes.astype(jnp.float32).T  # [4, Np]
    valid_r = valid.astype(jnp.float32)[None, :]  # [1, Np]

    kernel = functools.partial(
        _nms_sweep_kernel,
        num_tiles=n // TILE,
        thresh=float(iou_threshold),
        max_output=int(max_output),
    )
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(boxes_r, valid_r)
    return keep[0] > 0.5
