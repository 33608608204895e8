"""Multi-host setup: jax.distributed + global meshes.

The reference has no distributed backend at all (SURVEY.md §2.2); here
multi-host is a mesh-construction concern only — every device program in
the framework is already written against `jax.sharding` layouts, so
running on N hosts means calling `initialize_multihost()` first and
building meshes with `make_global_mesh`. In-program communication stays
XLA collectives over ICI/DCN; host-side mapper control is replicated-
deterministic (same inputs -> same decisions on every host), so no
control-plane messaging is needed.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod runtime's automatic configuration). Safe to call when single-
    process (no-op)."""
    import jax

    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh(axis: str = "obs"):
    """1-D mesh over ALL devices of all hosts (ICI-contiguous order)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def make_2d_mesh(obs_axis_size=None, axes=("replica", "obs")):
    """2-D mesh: replicate-across-hosts x shard-within-host — the layout
    that keeps the BA obs reductions on ICI and host-replication on DCN."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    local = jax.local_device_count()
    obs = obs_axis_size or local
    assert len(devs) % obs == 0
    return Mesh(devs.reshape(len(devs) // obs, obs), axes)


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0
