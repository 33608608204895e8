"""Sharded-vs-single wall-clock curve for the block-sharded distributed BA.

Runs on the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8)
— indicative of collective/partition structure, NOT of TPU speed; record
in PERF.md alongside the single-chip numbers. On real hardware the same
code path runs unchanged over the ICI mesh.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python scripts/bench_dist_ba.py [n_cams] [n_pts]
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from __graft_entry__ import _synthetic_ba_data_sparse  # noqa: E402
from mpsfm_tpu.ba.solver import solve_ba  # noqa: E402
from mpsfm_tpu.parallel.dist_ba import (  # noqa: E402
    make_mesh,
    partition_ba_data,
    solve_ba_block_sharded,
)


def timed(fn, reps=3):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        # force a transfer (block_until_ready is unreliable on some backends)
        float(np.asarray(out).sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    iters = 8
    data = _synthetic_ba_data_sparse(n_cams=n_cams, n_pts=n_pts, track_len=6)
    print(f"problem: {n_cams} cams, {n_pts} pts, "
          f"{int(np.asarray(data.r_valid).sum())} reproj obs, {iters} LM iters")

    t1 = timed(lambda: solve_ba(data, max_iters=iters)[3]["cost"])
    print(f"single-device solve_ba (PCG path): {t1*1e3:.0f} ms")

    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        t_part0 = time.perf_counter()
        parts, pids = partition_ba_data(data, n)
        t_part = time.perf_counter() - t_part0
        mesh = make_mesh(n, axis="blocks")
        t = timed(lambda: solve_ba_block_sharded(parts, mesh, max_iters=iters)[3]["cost"])
        print(
            f"block-sharded x{n}: {t*1e3:.0f} ms "
            f"(speedup vs single {t1/t:.2f}x; host partition {t_part*1e3:.0f} ms one-off)"
        )




def weak_scaling():
    """Problem size grows with the mesh: flat wall-clock = the per-device
    work (and psum cost) stays constant, which is the property that
    transfers to real multi-chip hardware."""
    iters = 8
    base_pts = 2048
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        data = _synthetic_ba_data_sparse(n_cams=64, n_pts=base_pts * n, track_len=6)
        parts, pids = partition_ba_data(data, n)
        mesh = make_mesh(n, axis="blocks")
        t = timed(lambda: solve_ba_block_sharded(parts, mesh, max_iters=iters)[3]["cost"])
        print(f"weak-scaling x{n}: {base_pts*n} pts -> {t*1e3:.0f} ms")


if __name__ == "__main__":
    main()
    weak_scaling()
