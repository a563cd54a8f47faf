"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is how the multi-chip sharding paths are exercised without TPU
hardware (the reference never tested multi-node at all — SURVEY.md §4).
Must run before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# tests run synthetic data with no pretrained weights on disk; allow the
# random-init fallback that production runs refuse (engine/driver.py)
os.environ["ABR_IOD_ALLOW_RANDOM_INIT"] = "1"
# persistent compile cache: e2e/CLI tests are compile-dominated on this
# one-core host — cached XLA programs cut the suite from ~13min to minutes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache_cpu"))

import jax  # noqa: E402

# this image's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
# TPU tunnel) before conftest runs, so the env var alone is not enough —
# override through the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
