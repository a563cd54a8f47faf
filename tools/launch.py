#!/usr/bin/env python
"""Local multi-process launcher — the reference's
``python -m torch.distributed.launch --nproc_per_node=N tools/...``
equivalent (scripts/run_SI.sh:20-24) for the JAX runtime.

Spawns N copies of the given tool with the distributed-init env vars
(ABR_IOD_COORDINATOR / NUM_PROCESSES / PROCESS_ID) that
``abr_iod_tpu.utils.platform.maybe_init_distributed`` consumes, using a
free local port from tools/get_free_port.py.  On a CPU host, pass
--devices-per-proc to give each process a virtual device slice (the
multi-chip test recipe, SURVEY.md §4); on real multi-host TPU each
process sees its own local chips automatically.

Usage:
  python tools/launch.py --nproc 2 tools/train_first_step.py -c cfg.yaml
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.get_free_port import next_free_port  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument(
        "--devices-per-proc", type=int, default=0,
        help="force this many virtual CPU devices per process "
             "(xla_force_host_platform_device_count); 0 = leave as-is",
    )
    ap.add_argument("tool", help="script to launch")
    ap.add_argument("tool_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    port = next_free_port()
    procs = []
    for rank in range(args.nproc):
        env = dict(os.environ)
        env.update(
            ABR_IOD_COORDINATOR=f"localhost:{port}",
            ABR_IOD_NUM_PROCESSES=str(args.nproc),
            ABR_IOD_PROCESS_ID=str(rank),
        )
        if args.devices_per_proc:
            flags = env.get("XLA_FLAGS", "")
            env["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{args.devices_per_proc}"
            ).strip()
        procs.append(subprocess.Popen(
            [sys.executable, args.tool, *args.tool_args], env=env
        ))
    codes = [p.wait() for p in procs]
    if any(codes):
        print(f"launch: worker exit codes {codes}", file=sys.stderr)
        sys.exit(max(codes))


if __name__ == "__main__":
    main()
