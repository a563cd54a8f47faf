"""Pallas NMS sweep (ops/nms_pallas.py) vs the XLA sweep (ops/nms.py).

Runs the kernel in interpret mode (tests execute on CPU); the on-chip
compile + bit-parity + 2.3x timing A/B is recorded in BASELINE.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from abr_iod_tpu.ops.nms import nms_padded
from abr_iod_tpu.ops.nms_pallas import nms_sweep_pallas


def _dense_boxes(rng, n, spread=200.0):
    ctr = rng.rand(n, 2) * spread
    wh = 20 + rng.rand(n, 2) * 60
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)


@pytest.mark.parametrize(
    "n,max_out,thr", [(256, 100, 0.5), (512, 50, 0.7), (1024, 300, 0.7)]
)
def test_pallas_sweep_matches_xla_selection(rng, n, max_out, thr):
    boxes = _dense_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.1

    order = np.argsort(-np.where(valid, scores, -1e10), kind="stable")
    keep = np.asarray(
        nms_sweep_pallas(
            jnp.asarray(boxes[order]),
            jnp.asarray(valid[order]),
            iou_threshold=thr,
            max_output=max_out,
            interpret=True,
        )
    )
    idx, ok = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=thr, max_output=max_out, backend="xla",
    )
    ref = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
    got = [int(order[i]) for i in np.nonzero(keep)[0][:max_out]]
    assert got == ref


def test_pallas_sweep_cap_skip_is_output_invariant(rng):
    """Tiles after the max_output-th keep are skipped inside the kernel;
    the truncated selection must still equal the full XLA sweep's."""
    n, thr = 1024, 0.7
    boxes = _dense_boxes(rng, n, spread=2000.0)  # sparse → many keeps
    valid = np.ones(n, bool)
    for max_out in (64, 128, 200):
        keep = np.asarray(
            nms_sweep_pallas(
                jnp.asarray(boxes), jnp.asarray(valid),
                iou_threshold=thr, max_output=max_out, interpret=True,
            )
        )
        idx, ok = nms_padded(
            jnp.asarray(boxes),
            jnp.asarray(np.linspace(1.0, 0.0, n, dtype=np.float32)),
            jnp.asarray(valid),
            iou_threshold=thr, max_output=max_out,
            presorted=True, backend="xla",
        )
        ref = [int(i) for i, o in zip(np.asarray(idx), np.asarray(ok)) if o]
        got = list(np.nonzero(keep)[0][:max_out])
        assert got == ref


def test_backend_dispatch_and_validation():
    from abr_iod_tpu.ops.nms import _pallas_enabled, set_nms_backend

    assert not _pallas_enabled("xla")
    assert _pallas_enabled("pallas")
    # 'auto' on the CPU test backend resolves to the XLA sweep
    assert not _pallas_enabled("auto")
    with pytest.raises(ValueError):
        set_nms_backend("cuda")
