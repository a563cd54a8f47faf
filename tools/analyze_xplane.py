#!/usr/bin/env python
"""Aggregate device-op time from a jax.profiler xplane trace.

Usage: python tools/analyze_xplane.py <trace_dir> [--top N] [--iters K]

Walks <trace_dir> for the newest ``*.xplane.pb``, sums event durations on
the accelerator device planes (one row per XLA op/fusion name), and
prints the top-N ops plus the interval-union busy time — the profiled
counterpart of BASELINE.md's utilization figures (the reference keeps
only a commented-out torch.profiler block, engine/trainer.py:63-71;
here profiling is a first-class tool).

Parsing uses tensorflow's bundled xplane proto (no network, no
tensorboard server needed).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict


def _load_xspace(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace, path


def analyze(trace_dir: str, top: int = 25, iters: int = 1):
    xspace, path = _load_xspace(trace_dir)
    print(f"trace: {path}")
    device_planes = [
        p for p in xspace.planes
        if "TPU" in p.name or "GPU" in p.name or "/device:" in p.name
    ]
    if not device_planes:
        print("planes found:", [p.name for p in xspace.planes])
        sys.exit("no device plane in trace")

    for plane in device_planes:
        names = dict(plane.event_metadata)
        op_ns = defaultdict(float)
        intervals = []
        # keep only the per-op lines: module/step/async lines nest the same
        # time and would double-count
        op_lines = [l for l in plane.lines if "XLA Ops" in l.name] or [
            l for l in plane.lines
            if not any(k in l.name for k in ("Module", "Step", "Async", "Framework"))
        ]
        print(f"\nlines in {plane.name}: {[l.name for l in plane.lines]}")
        for line in op_lines:
            for ev in line.events:
                md = names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e3  # ps → ns
                op_ns[name] += dur
                start = ev.offset_ps / 1e3
                intervals.append((start, start + dur))
        if not op_ns:
            continue
        intervals.sort()
        busy = 0.0
        cur_s, cur_e = intervals[0]
        for s, e in intervals[1:]:
            if s > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        busy += cur_e - cur_s
        total = sum(op_ns.values())
        print(f"\n== {plane.name} ==")
        print(f"busy (interval union): {busy/1e6:.2f} ms"
              + (f"  ({busy/1e6/iters:.2f} ms/iter)" if iters > 1 else ""))
        print(f"sum of op durations:   {total/1e6:.2f} ms")
        print(f"{'ms':>10} {'ms/iter':>9} {'%':>6}  op")
        for name, ns in sorted(op_ns.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ns/1e6:10.2f} {ns/1e6/iters:9.3f} {100*ns/total:6.2f}  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=1,
                    help="timed iterations in the trace (for ms/iter)")
    args = ap.parse_args()
    analyze(args.trace_dir, args.top, args.iters)
