"""Checkpointing + incremental weight alignment.

Reference equivalents:
  * DetectronCheckpointer (utils/checkpoint.py:13-142): save model/
    optimizer/iteration, ``trim=True`` writes weights-only for seeding
    the next incremental step, ``last_checkpoint`` pointer enables
    implicit resume.
  * align_and_update_state_dicts (utils/model_serialization.py:10-91):
    on shape mismatch, copy the old tensor into the leading slice of the
    new one — the mechanism that grows a 16-class head into a 21-class
    head.  Here it is explicit pytree surgery.

Storage is msgpack (flax.serialization) — single-file, pure-pytree
(no pickled code), and path-compatible with the config tree's
``model_{final,trimmed}.msgpack`` pointers.

Production hardening beyond the reference:
  * every write is ATOMIC (tmp file + ``os.replace``) and the
    ``last_checkpoint`` pointer is only updated after the data file is
    fully on disk — a preemption mid-save can never leave a corrupt
    resume target (the reference's ``torch.save`` writes in place).
  * ``async_saves=True`` moves serialization + disk IO to a single
    background worker so the train loop never stalls on checkpoint
    writes; the host snapshot (``np.asarray`` of every leaf) still
    happens synchronously, so donated device buffers are safe to reuse
    the moment ``save`` returns.  Ordering is preserved (one worker),
    errors surface on the next ``save``/``wait``/``load``, and
    multi-process runs fall back to synchronous saves so the
    post-save barrier keeps its meaning.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _tree_template(tree):
    """Shape/dtype-only numpy skeleton of a pytree.  flax's from_bytes
    needs a target with the right structure and leaf shapes, NOT the
    values — materializing device arrays here (np.asarray) would
    device→host transfer the entire params+optimizer state (~264 MB for
    R-50-C4) just to overwrite it, which costs minutes on slow
    host↔device links (BASELINE.md round-4 data-plane notes)."""

    def conv(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return np.zeros(x.shape, x.dtype)
        return x

    return jax.tree_util.tree_map(conv, tree)


class Checkpointer:
    """Minimal checkpointer with a ``last_checkpoint`` pointer file."""

    def __init__(self, output_dir: str, async_saves: bool = False):
        self.output_dir = output_dir
        self.async_saves = async_saves
        self._executor: Optional[ThreadPoolExecutor] = None
        self._futures: list = []
        os.makedirs(output_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, f"{name}.msgpack")

    @staticmethod
    def _atomic_write(path: str, data: bytes) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def _write(self, path: str, payload: Any, update_pointer: bool) -> None:
        self._atomic_write(path, serialization.to_bytes(payload))
        if update_pointer:
            # trimmed (params-only) saves must not become the resume target:
            # they carry no opt_state/iteration, so a re-run would silently
            # restart at iteration 0 (reference utils/checkpoint.py:50-52
            # likewise only tags full saves).  Pointer AFTER data: resume
            # never dereferences a half-written file.
            self._atomic_write(
                os.path.join(self.output_dir, "last_checkpoint"),
                path.encode(),
            )

    def wait(self) -> None:
        """Block until every pending async save is on disk; re-raise the
        first worker error (so IO failures are not silently dropped)."""
        futures, self._futures = self._futures, []
        for fut in futures:
            fut.result()

    def save(self, name: str, state: Any, trim: bool = False, **extra) -> str:
        """state: dict with at least 'params'; trim=True stores params only
        (reference utils/checkpoint.py:32-52).

        Multi-process: only process 0 touches disk (the reference's
        ``save_to_disk = get_rank() == 0``, utils/checkpoint.py:13-30);
        all processes barrier before returning the path so a follow-up
        load on any rank sees the completed file (assumes the reference's
        shared-OUTPUT_DIR deployment; non-shared filesystems need an
        external copy step, as they would with the reference)."""
        from . import comm

        if not comm.is_main_process():
            comm.synchronize()
            return self._path(name)
        # surface errors from already-finished async writes without blocking
        # (ordering needs no wait: the single worker runs writes FIFO)
        while self._futures and self._futures[0].done():
            self._futures.pop(0).result()
        payload = {"params": state["params"]}
        if not trim:
            for k, v in state.items():
                if k != "params":
                    payload[k] = v
            payload.update(extra)
        # host snapshot now — callers may donate/overwrite device buffers
        # as soon as save() returns
        payload = _tree_to_numpy(payload)
        path = self._path(name)
        if self.async_saves and comm.get_world_size() == 1:
            if self._executor is None:
                self._executor = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ckpt-io"
                )
            self._futures.append(
                self._executor.submit(self._write, path, payload, not trim)
            )
        else:
            self._write(path, payload, update_pointer=not trim)
        comm.synchronize()
        return path

    def has_checkpoint(self) -> bool:
        self.wait()
        return os.path.exists(os.path.join(self.output_dir, "last_checkpoint"))

    def last_checkpoint_path(self) -> Optional[str]:
        self.wait()
        p = os.path.join(self.output_dir, "last_checkpoint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def load(self, template: Any = None, path: Optional[str] = None) -> Any:
        """Restore a checkpoint.  With `template` the result mirrors its
        structure; without, the raw dict-of-arrays is returned (useful
        for cross-shape head growth via align_and_update_params)."""
        self.wait()
        path = path or self.last_checkpoint_path()
        if path is None or not os.path.exists(path):
            raise FileNotFoundError(f"no checkpoint at {path!r}")
        with open(path, "rb") as f:
            data = f.read()
        if template is None:
            return serialization.msgpack_restore(data)
        return serialization.from_bytes(_tree_template(template), data)

    @staticmethod
    def load_file(path: str) -> Any:
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())


def restack_for_scan(new_tree, old_tree, log_fn=None):
    """Pre-pass for scan_blocks models: where the new tree has a scanned
    stage ({block0, block_rest: {block: stacked}}) and the old tree has
    the unrolled layout (block0..blockN), restack the old blocks so the
    leading-slice merge applies (models/resnet.py Stage.scan_blocks)."""

    def walk(new, old):
        if not isinstance(new, dict) or not isinstance(old, dict):
            return old
        if "block_rest" in new and "block1" in old:
            n_rest = 0
            while f"block{n_rest + 1}" in old:
                n_rest += 1
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[old[f"block{i}"] for i in range(1, n_rest + 1)],
            )
            if log_fn:
                log_fn(f"restacked {n_rest} blocks into scanned layout")
            out = {"block0": old.get("block0"), "block_rest": {"block": stacked}}
            return out
        if "block1" in new and "block_rest" in old:
            # scanned checkpoint → unrolled model: unstack
            stacked = old["block_rest"]["block"]
            n_rest = jax.tree_util.tree_leaves(stacked)[0].shape[0]
            out = {"block0": old.get("block0")}
            for i in range(n_rest):
                out[f"block{i + 1}"] = jax.tree_util.tree_map(
                    lambda x: np.asarray(x)[i], stacked
                )
            if log_fn:
                log_fn(f"unstacked scanned layout into {n_rest} blocks")
            return out
        return {k: (walk(new[k], v) if k in new else v) for k, v in old.items()}

    return walk(new_tree, old_tree)


def align_and_update_params(new_params, old_params, log_fn=None):
    """Copy old params onto a freshly-initialized (possibly larger) tree.

    For every leaf present in both trees: if shapes match, take the old
    value; on mismatch copy the old tensor into the leading slice of the
    new one, keeping the fresh initialization elsewhere — exactly the
    reference's head-growth rule (model_serialization.py:45-55).
    Leaves only present in the new tree keep their fresh init.  Scanned
    (scan_blocks) ↔ unrolled stage layouts are reconciled first.
    """
    old_params = restack_for_scan(new_params, old_params, log_fn)

    def merge(new, old, path=""):
        if isinstance(new, dict):
            out = {}
            for k, v in new.items():
                if isinstance(old, dict) and k in old:
                    out[k] = merge(v, old[k], f"{path}/{k}")
                else:
                    out[k] = v
            return out
        new_arr = np.asarray(new)
        old_arr = np.asarray(old)
        if new_arr.shape == old_arr.shape:
            # copy, never alias: the student tree is typically donated to a
            # jit step while the teacher tree stays live — shared buffers
            # would trip XLA's donation check
            return np.array(old_arr)
        if new_arr.ndim != old_arr.ndim:
            if log_fn:
                log_fn(f"skip {path}: rank mismatch {old_arr.shape} vs {new_arr.shape}")
            return new
        out = np.array(new_arr)
        slices = tuple(slice(0, min(o, n)) for o, n in zip(old_arr.shape, new_arr.shape))
        out[slices] = old_arr[slices]
        if log_fn:
            log_fn(f"grow {path}: {old_arr.shape} -> {new_arr.shape}")
        return out

    return merge(new_params, old_params)
