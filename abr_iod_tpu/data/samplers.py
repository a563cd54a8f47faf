"""Sampling strategies (reference: data/samplers/{distributed,
grouped_batch_sampler,iteration_based_batch_sampler}.py).

In the TPU design most of the reference's sampler machinery dissolves:
  * DistributedSampler → per-process strided sharding of an epoch-
    shuffled index stream (distributed.py:42-60's pad-and-slice)
  * IterationBasedBatchSampler → an infinite stream cut at MAX_ITER
  * GroupedBatchSampler (aspect-ratio grouping) → intentionally ABSENT:
    its purpose was limiting ragged-padding waste, which the static
    canvas already fixes at the compiler level (SURVEY.md §7)

These generators are what DetectionLoader uses internally; they are
exposed here for direct use and API parity.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def distributed_shard_indices(n: int, shard_index: int = 0, num_shards: int = 1,
                              shuffle: bool = True, seed: int = 0,
                              epoch: int = 0) -> np.ndarray:
    """One epoch of per-process indices, padded to be divisible like the
    reference's DistributedSampler (pad-to-divisible then slice)."""
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(order)
    total = ((n + num_shards - 1) // num_shards) * num_shards
    if total > n:
        order = np.concatenate([order, order[: total - n]])
    return order[shard_index::num_shards]


def iteration_based_stream(n: int, max_iterations: int, batch_size: int,
                           shard_index: int = 0, num_shards: int = 1,
                           shuffle: bool = True, seed: int = 0,
                           start_iter: int = 0) -> Iterator[np.ndarray]:
    """Infinite epoch-shuffled batches cut at max_iterations
    (IterationBasedBatchSampler equivalent, resumable at start_iter)."""
    produced = 0
    epoch = 0
    buf: list = []
    while produced < max_iterations:
        idxs = distributed_shard_indices(
            n, shard_index, num_shards, shuffle, seed, epoch
        )
        for i in idxs:
            buf.append(i)
            if len(buf) == batch_size:
                if produced >= start_iter:
                    yield np.asarray(buf)
                buf = []
                produced += 1
                if produced >= max_iterations:
                    return
        epoch += 1
