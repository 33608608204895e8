"""Worker process for the 2-process jax.distributed dryrun.

Launched by test_multihost.py: each process owns 4 virtual CPU devices;
`initialize_multihost` builds the process group (Gloo-backed CPU
collectives), `make_global_mesh` spans all 8 devices across both
processes, and the block-sharded BA solver runs over the global mesh —
the exact code path a real multi-host TPU pod uses (the reference has no
distributed layer at all, SURVEY.md §2.2; this is the framework's
north-star scaling path). Each process independently checks parity
against the single-device solver and writes a JSON verdict the parent
test asserts on.

Must be a standalone script: jax.distributed must be initialized before
any backend touch, which an in-pytest import cannot guarantee.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mpsfm_tpu.parallel.multihost import (
        initialize_multihost,
        is_coordinator,
        make_global_mesh,
    )

    assert initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    import mpsfm_tpu  # noqa: F401  (package config; disable the compile cache)

    jax.config.update("jax_compilation_cache_dir", None)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.ba.solver import solve_ba
    from mpsfm_tpu.parallel.dist_ba import (
        partition_ba_data,
        solve_ba_block_sharded,
        unpartition_points,
    )

    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4
    assert is_coordinator() == (pid == 0)

    # identical deterministic problem on every process (replicated host
    # control is the framework's multi-host model: same inputs -> same
    # decisions, no control-plane messaging)
    data = _synthetic_ba_data(n_cams=8, n_pts=128)
    parts, pids = partition_ba_data(data, jax.device_count())
    mesh = make_global_mesh("blocks")
    assert mesh.devices.size == 8

    q2, t2, x2, info2 = solve_ba_block_sharded(parts, mesh, max_iters=6)

    # cross-process all-gather of the point shards (a real DCN/ICI
    # collective) -> replicated array every process can read
    x2r = jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, P())
    )(x2)
    x2g = unpartition_points(np.asarray(jax.device_get(x2r)), pids, data.xyz.shape[0])

    # single-device reference on this process's first local device
    q1, t1, x1, info1 = solve_ba(data, max_iters=6)

    verdict = {
        "pid": pid,
        "process_count": int(jax.process_count()),
        "device_count": int(jax.device_count()),
        "cost0_dist": float(info2["cost0"]),
        "cost_dist": float(info2["cost"]),
        "cost0_ref": float(info1["cost0"]),
        "cost_ref": float(info1["cost"]),
        "quat_maxdiff": float(np.abs(np.asarray(jax.device_get(q2)) - np.asarray(q1)).max()),
        "t_maxdiff": float(np.abs(np.asarray(jax.device_get(t2)) - np.asarray(t1)).max()),
        "xyz_maxdiff": float(np.abs(x2g - np.asarray(x1)).max()),
        "n_local_shards": len(x2.addressable_shards),
    }
    with open(os.path.join(outdir, f"verdict_{pid}.json"), "w") as f:
        json.dump(verdict, f)
    print("OK", pid, verdict)


if __name__ == "__main__":
    main()
