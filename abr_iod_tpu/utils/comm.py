"""Multi-host communication helpers.

Reference: maskrcnn_benchmark/utils/comm.py — rank/world/synchronize/
all_gather/reduce_dict over torch.distributed+NCCL.  The JAX-native
equivalents: process index/count come from the runtime, in-step
reductions are psum/pmean inside jit (free, fused — subsuming
reduce_loss_dict), and host-level gathers use multihost_utils.  The
reference's eval gather was disabled (engine/inference.py:136-137);
``all_gather_objects`` restores that capability for multi-host eval.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across hosts (no-op single-process, like the reference)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("abr_iod_tpu.synchronize")


def host_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier over the coordination service — NO device
    collectives.  Use around compilation: XLA:CPU's Gloo rendezvous gives
    a peer a hard ~30 s window to show up, so letting one rank execute a
    collective while another is still compiling kills the run; this
    barrier (generous, configurable timeout) lines the ranks up first.
    No-op single-process or when the distributed client is absent."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host (reference
    utils/comm.py:48-88: pickle → pad-to-max byte tensor → all_gather →
    trim; same recipe here, since process_allgather requires same-shaped
    array pytrees across processes and eval predictions are ragged)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    local_len = np.array([payload.size], dtype=np.int64)
    lengths = np.asarray(
        multihost_utils.process_allgather(local_len, tiled=False)
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(
        multihost_utils.process_allgather(padded, tiled=False)
    ).reshape(jax.process_count(), max_len)
    return [
        pickle.loads(gathered[i, : int(lengths[i])].tobytes())
        for i in range(jax.process_count())
    ]


def reduce_dict(d: Dict[str, jnp.ndarray], average: bool = True) -> Dict[str, float]:
    """Cross-host mean of scalar metrics (reference utils/comm.py:91-117).

    Inside a jit step metrics are already global (XLA reduces over the
    mesh), so this is only needed for host-side python scalars."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in d.items()}
    gathered = all_gather_objects({k: float(v) for k, v in d.items()})
    out = {}
    for k in d:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / len(vals) if average else sum(vals)
    return out


def reduce_loss_dict(loss_dict):
    """Name-parity alias for the reference's engine/trainer.py:15-37:
    inside a jit step over the mesh, losses come back already globally
    averaged, so this is the identity on a single host and a cross-host
    mean otherwise."""
    return reduce_dict(loss_dict, average=True)
