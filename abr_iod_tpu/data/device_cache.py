"""Device-resident canvas bank: keep training canvases cached in HBM.

Iteration-based training (reference data/build.py:109-169 — len(loader)
== MAX_ITER) revisits the same few-thousand images for thousands of
iterations.  The host-side LRU (loader.py `_resized`) already removes
the repeated decode+resize; this bank removes the repeated **host→device
transfer**, which measurement shows dominates the CLI loop on hosts with
a slow interconnect (tools/probe_data_plane.py: the 27 MB uint8 pixel
batch costs ~230 ms through this environment's ~110 MB/s tunnel vs a
117 ms device step; on PCIe-attached TPU VMs the transfer is ~2 ms and
the bank merely saves bandwidth).

Design: one uint8 array ``bank[S, H, W, 3]`` per canvas orientation,
resident on device.  Keys mirror the host canvas cache —
``(index, min_size, canvas_hw, flipped)`` — so a bank entry is exactly
the bytes the host would have shipped; hits are bit-identical by
construction.  Misses upload ONE canvas (``jax.device_put``) and scatter
it into the bank with a donated ``.at[slot].set``; batch assembly is a
single on-device gather ``bank[idx]`` (HBM→HBM, ~0.1 ms for a batch-8
canvas) whose output is sharded over the mesh's ``data`` axis like any
host-uploaded batch.

The reference has no analogue (its DataLoader re-ships every batch over
PCIe); this is TPU-native capability: for datasets that fit the budget
(VOC-scale at reduced budgets, synthetic/benchmark sets entirely) the
steady-state pixel plane never touches the wire.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Key = Tuple  # (index, min_size, canvas_hw, flipped)


class DeviceCanvasBank:
    """LRU canvas cache in device memory.

    Thread contract: ``contains`` may be called from the loader's
    prefetch/worker threads; ``batch`` only from the thread that runs the
    train loop.  ``contains(key) == True`` *pins* the key (the loader
    will not produce pixel bytes for it), so eviction skips pinned keys
    until the next ``batch`` call consumes them.
    """

    def __init__(self, budget_mb: float, canvas_hw: Tuple[int, int],
                 dual_orientation: bool = True, out_sharding=None,
                 max_keys_hint: Optional[int] = None):
        self.budget = int(budget_mb * 2**20)
        self.out_sharding = out_sharding
        self._hint = max_keys_hint
        shapes = [tuple(canvas_hw)]
        if dual_orientation and canvas_hw[0] != canvas_hw[1]:
            shapes.append((canvas_hw[1], canvas_hw[0]))
        self._shapes = shapes
        self._banks: Dict[tuple, object] = {}
        self._slots: Dict[tuple, "OrderedDict[Key, int]"] = {
            s: OrderedDict() for s in shapes}
        self._free: Dict[tuple, List[int]] = {}
        # key → pin count.  A COUNT, not a set: with prefetch depth ≥ 2
        # the loader can promise the same key for several queued batches
        # before the first of them is consumed; batch() releases exactly
        # one pin per occurrence, so a promise made for a later batch
        # survives earlier batches' eviction pressure.
        self._pinned: Dict[Key, int] = {}
        self._lock = threading.Lock()
        self._gather = {}
        self._insert = {}
        self.hits = 0
        self.misses = 0
        # metadata side-car: (index, min_size, canvas_hw) → (size_hw,
        # boxes), shared across DetectionLoader instances that attach this
        # bank — a fresh loader (tools/eval_steps.py builds one per
        # run_test call) can then serve bank hits without re-decoding the
        # image for its boxes/size (the loader's own _meta_cache would
        # start empty).  Plain dict: item writes are atomic under the GIL
        # and keys are write-once (same contract as the loader's local
        # meta cache, which this replaces when a bank is attached).
        self.meta: Dict[tuple, tuple] = {}

    # ------------------------------------------------------------- sizing
    def _capacity(self, shape: tuple) -> int:
        nbytes = shape[0] * shape[1] * 3
        cap = self.budget // max(nbytes, 1)
        if self._hint is not None:
            cap = min(cap, self._hint)
        return int(cap)

    def _ensure_bank(self, shape: tuple):
        # holds self._lock for the whole (once-per-shape) construction:
        # loader worker threads read _slots/_banks concurrently via
        # contains(), and the class's thread contract promises those reads
        # are lock-synchronized — not merely GIL-safe.
        with self._lock:
            return self._ensure_bank_locked(shape)

    def _ensure_bank_locked(self, shape: tuple):
        if shape in self._banks:
            return self._banks[shape] is not None
        self._slots.setdefault(shape, OrderedDict())
        cap = self._capacity(shape)
        if cap <= 0:
            self._banks[shape] = None
            return False
        import jax
        import jax.numpy as jnp

        bank_sharding = None
        if self.out_sharding is not None:
            # shard the SLOT axis over the mesh's data axis: each device
            # holds 1/n of the bank (no n× HBM replication) and the batch
            # gather rides ICI — ~27 MB per batch-8 step, negligible.
            mesh = self.out_sharding.mesh
            n_data = mesh.shape.get("data", 1)
            if n_data > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                cap -= cap % n_data  # slot axis must divide evenly
                if cap <= 0:
                    self._banks[shape] = None
                    return False
                bank_sharding = NamedSharding(mesh, P("data"))
        zeros = jnp.zeros((cap,) + shape + (3,), jnp.uint8)
        if bank_sharding is not None:
            zeros = jax.device_put(zeros, bank_sharding)
        self._banks[shape] = zeros
        self._free[shape] = list(range(cap - 1, -1, -1))
        ins_kw = ({"out_shardings": bank_sharding}
                  if bank_sharding is not None else {})
        self._insert[shape] = jax.jit(
            lambda b, c, s: b.at[s].set(c), donate_argnums=0, **ins_kw)
        kw = ({"out_shardings": self.out_sharding}
              if self.out_sharding is not None else {})
        self._gather[shape] = jax.jit(lambda b, i: b[i], **kw)
        return True

    # ---------------------------------------------------------- loader API
    def contains(self, key: Key) -> bool:
        """True iff the bank holds ``key`` (and will keep holding it until
        the next ``batch`` call).  Loader threads call this to skip
        producing pixel bytes for banked images."""
        shape = tuple(key[2])
        with self._lock:
            slots = self._slots.get(shape)
            if slots is None or key not in slots:
                return False
            slots.move_to_end(key)
            self._pinned[key] = self._pinned.get(key, 0) + 1
            return True

    def release(self, keys: Sequence[Key]) -> None:
        """Release one promise pin per key — for batches that were
        prefetched but never consumed (early break / exception / generator
        close): their ``contains()`` pins would otherwise leak and pin the
        slots unevictable for the rest of the run.  Called from the
        loader's prefetch drain path with the banked keys of each dropped
        batch."""
        with self._lock:
            for key in keys:
                c = self._pinned.get(key, 0) - 1
                if c > 0:
                    self._pinned[key] = c
                else:
                    self._pinned.pop(key, None)

    # ------------------------------------------------------------ assembly
    def batch(self, keys: Sequence[Key], canvases: Sequence[Optional[np.ndarray]]):
        """Assemble the device uint8 pixel batch for ``keys``.

        ``canvases[i]`` must hold the host canvas when the loader was not
        told the key was banked (miss), and may be None on hits.  Returns
        a [B, H, W, 3] uint8 device array (sharded per ``out_sharding``).
        """
        import jax

        shape = tuple(keys[0][2])
        banked = self._ensure_bank(shape)
        idx = np.zeros(len(keys), np.int32)
        direct: List[Tuple[int, np.ndarray]] = []  # unbankable -> overlay
        with self._lock:
            slots = self._slots[shape]
            # every key of THIS batch stays pinned until the gather below:
            # a later miss in the same batch must not evict a slot that
            # idx[] already points at (hit or fresh insert alike).  For
            # occurrences the loader skipped (canvas None) the promise pin
            # taken by contains() doubles as the batch pin; the rest take
            # a fresh pin here.  finally releases one pin per occurrence.
            for key, canvas in zip(keys, canvases):
                if canvas is not None:
                    self._pinned[key] = self._pinned.get(key, 0) + 1
            for i, (key, canvas) in enumerate(zip(keys, canvases)):
                slot = slots.get(key) if banked else None
                if slot is not None:
                    slots.move_to_end(key)
                    idx[i] = slot
                    self.hits += 1
                    continue
                self.misses += 1
                assert canvas is not None, (
                    f"bank miss for {key} but the loader produced no canvas "
                    "(contains() promised a hit that was since lost)")
                if not banked:
                    direct.append((i, canvas))
                    continue
                slot = self._alloc_slot(shape, slots)
                if slot is None:  # everything pinned — rare; ship directly
                    direct.append((i, canvas))
                    continue
                up = jax.device_put(np.ascontiguousarray(canvas))
                self._banks[shape] = self._insert[shape](
                    self._banks[shape], up, slot)
                slots[key] = slot
                idx[i] = slot
        try:
            if banked:
                out = self._gather[shape](self._banks[shape], idx)
                for i, canvas in direct:
                    out = out.at[i].set(
                        jax.device_put(np.ascontiguousarray(canvas)))
            else:
                out = jax.device_put(
                    np.stack([c for _, c in direct]), self.out_sharding)
        finally:
            with self._lock:
                for key in keys:
                    c = self._pinned.get(key, 0) - 1
                    if c > 0:
                        self._pinned[key] = c
                    else:
                        self._pinned.pop(key, None)
        return out

    def _alloc_slot(self, shape: tuple, slots: "OrderedDict[Key, int]"):
        free = self._free[shape]
        if free:
            return free.pop()
        victim = next((k for k in slots if k not in self._pinned), None)
        return slots.pop(victim) if victim is not None else None

    # ---------------------------------------------------------- statistics
    def stats(self) -> dict:
        with self._lock:
            held = {s: len(v) for s, v in self._slots.items()}
        total = self.hits + self.misses
        return {
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": self.hits / total if total else 0.0,
            "entries": held,
        }
