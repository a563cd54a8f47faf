"""Misc utilities (reference: utils/{miscellaneous,timer,collect_env,
env,imports}.py)."""

from __future__ import annotations

import datetime
import importlib.util
import os
import time


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def import_file(module_name: str, file_path: str, make_importable: bool = False):
    """Load a python file as a module (reference utils/imports.py — used
    for PATHS_CATALOG indirection)."""
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if make_importable:
        import sys

        sys.modules[module_name] = module
    return module


class Timer:
    """Cumulative timer (reference utils/timer.py:8-46)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True):
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        return self.average_time if average else self.diff

    @property
    def average_time(self):
        return self.total_time / self.calls if self.calls > 0 else 0.0

    def total_time_str(self):
        return str(datetime.timedelta(seconds=int(self.total_time)))


def collect_env_info() -> str:
    """Environment dump (reference utils/collect_env.py)."""
    import jax

    lines = [
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"process: {jax.process_index()}/{jax.process_count()}",
    ]
    try:
        import flax
        import optax

        lines += [f"flax: {flax.__version__}", f"optax: {optax.__version__}"]
    except Exception:
        pass
    return "\n".join(lines)
