"""Logging + metrics (reference: utils/logger.py, utils/metric_logger.py,
and the TensorBoard scalar writes in tools/train_incremental.py:160-170).

Scalars are written as JSONL (always) and to tensorboardX when the
package exists — the JSONL stream is the observability source of truth
on the TPU VM.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from collections import defaultdict, deque


def setup_logger(name: str, save_dir: str = "", rank: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    if rank > 0:
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SmoothedValue:
    """Window-20 median/avg (reference utils/metric_logger.py:8-37)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.deque.append(value)
        self.total += value
        self.count += 1

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})"
            for name, m in self.meters.items()
        )


class ScalarWriter:
    """JSONL scalar stream + optional tensorboardX mirror."""

    def __init__(self, log_dir: str):
        # rank-0 only, like the reference's SummaryWriter usage
        # (tools/train_incremental.py:209 creates it on the main process)
        from . import comm

        self._f = None
        self._tb = None
        if not comm.is_main_process():
            return
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        if self._f is None:
            return
        self._f.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "time": time.time()})
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
