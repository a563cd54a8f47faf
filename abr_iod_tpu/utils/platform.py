"""Platform selection helper.

Some TPU VM images pre-import jax from sitecustomize with a pinned
platform plugin, which makes a later ``JAX_PLATFORMS`` env var
ineffective (the config default was already read).  Calling this early
re-applies the env var through the config API, which works as long as no
backend has been initialized yet.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        jax.config.update("jax_platforms", want)
    except Exception:
        pass
