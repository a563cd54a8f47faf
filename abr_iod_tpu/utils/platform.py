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


def enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user dir (or
    ``JAX_COMPILATION_CACHE_DIR`` when set).  The fused train step takes
    minutes to compile cold and the eval pipeline tens of seconds — with
    the cache a re-invocation of any CLI tool starts in seconds.  The
    reference has no analogue (CUDA kernels are AOT), so without this the
    TPU tools pay a compile tax per process that the torch tools never
    did."""
    try:
        import jax

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "abr_iod_tpu", "jax_cache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program regardless of compile time / size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # never fail a run over cache plumbing


def maybe_init_distributed() -> None:
    """Multi-process launch hook — the reference's
    ``torch.distributed.launch`` + ``init_process_group(nccl)`` analogue
    (tools/train_first_step.py:198-200).  tools/launch.py sets these env
    vars when spawning one process per slice; single-process runs leave
    them unset and this is a no-op.  On TPU pods with a cluster
    environment, plain ``jax.distributed.initialize()`` (no args,
    auto-detected) can be requested with ABR_IOD_DISTRIBUTED=auto."""
    mode = os.environ.get("ABR_IOD_DISTRIBUTED", "")
    coord = os.environ.get("ABR_IOD_COORDINATOR", "")
    if not coord and mode != "auto":
        return
    import jax

    if mode == "auto" and not coord:
        jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["ABR_IOD_NUM_PROCESSES"]),
        process_id=int(os.environ["ABR_IOD_PROCESS_ID"]),
    )
