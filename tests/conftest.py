"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-host testing strategy in SURVEY.md §4 — CPU fake-device
meshes let the multi-chip sharding paths compile and execute without TPU
hardware. Env vars must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin (axon) force-selects itself through jax.config
# at interpreter start; point the config back at CPU before any backend is
# initialized so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# The package enables a persistent compilation cache (for TPU compile
# amortization); with the CPU backend + hundreds of test programs the
# cache serialization has produced segfaults — disable it for tests.
import mpsfm_tpu  # noqa: E402,F401

jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
