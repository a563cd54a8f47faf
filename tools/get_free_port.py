#!/usr/bin/env python
"""Free-TCP-port helper (reference: tools/get_free_port.py).

The reference needed this for torch.distributed.launch rendezvous;
here tools/launch.py uses it for the jax.distributed coordinator port,
and scripts/run_*.sh call it for script compatibility."""

import socket


def next_free_port(port: int = 29500, max_port: int = 65535) -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    while port <= max_port:
        try:
            s.bind(("", port))
            s.close()
            return port
        except OSError:
            port += 1
    raise IOError("no free ports")


if __name__ == "__main__":
    print(next_free_port())
