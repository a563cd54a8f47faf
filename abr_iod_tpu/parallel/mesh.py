"""Device mesh + sharding helpers.

The reference's parallelism is DDP/NCCL data parallelism
(tools/train_first_step.py:60-65, utils/comm.py — SURVEY.md §2.9).  The
TPU-native equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis
(batch-sharded inputs, replicated params; XLA inserts the gradient
all-reduce over ICI) plus an optional ``model`` axis for tensor-sharded
heavy weights (res5 / predictor) — capability the reference never had.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays batch-sharded over 'data'.

    Single-process: a plain sharded device_put.  Multi-process: each host
    holds only its shard of the global batch (DetectionLoader slices
    orientation-grouped global batches per process), so assemble the
    global array from per-process local data."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def _is_tp_kernel(names) -> bool:
    """Heavy matmul weights worth sharding over 'model': the res5 RoI head
    convs and the predictor Dense kernels (the FLOPs live there)."""
    if "res5" in names and names[-1] == "kernel":
        return True
    if names[-1] == "kernel" and any(n in ("cls_score", "bbox_pred") for n in names):
        return True
    return False


def param_shardings(mesh: Mesh, params):
    """NamedShardings for a param tree: TP-shard heavy kernels on their
    output-channel dim over 'model', replicate the rest.  With
    MESH_MODEL=1 this degrades to pure replication (reference-equivalent
    data parallelism)."""
    model_size = mesh.shape["model"]

    def one(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if (
            model_size > 1
            and leaf.ndim >= 2
            and _is_tp_kernel(names)
            and leaf.shape[-1] % model_size == 0
        ):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def _put_host(x, sh: NamedSharding):
    """Commit a host (or locally-addressable) value to a sharding,
    collective-free at any world size.

    Multi-process ``jax.device_put`` of a host value onto a global
    sharding runs ``multihost_utils.assert_equal`` — one Gloo allgather
    PER LEAF — which is slow at param-tree scale and racy at cold start
    (contexts rendezvous under a 30 s timeout while ranks are still
    compiling).  ``make_array_from_callback`` materializes only the
    addressable shards from local data instead.  Callers must pass
    value-identical trees on every process (deterministic init or a
    shared checkpoint) — the same invariant the reference meets with
    DDP's initial broadcast (torch DistributedDataParallel), met here by
    construction."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sh, lambda idx: host[idx])


def shard_params(mesh: Mesh, params):
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(_put_host, params, shardings)


def put_like(host_tree, ref_tree):
    """Commit a host pytree onto the shardings of a live (possibly
    global) tree — the restore path's re-shard, collective-free."""
    return jax.tree_util.tree_map(
        lambda h, r: _put_host(h, r.sharding), host_tree, ref_tree
    )
