"""Large-scene global BA bench on the real chip (VERDICT r1 item 7).

Synthetic 512-cam / 131k-point prior-regularized global bundle (sparse
track-6 covisibility, ~786k reprojection + ~33k depth observations) run
through the slot-table LM-Schur path — the configuration the BASELINE
"500+ image" row exercises, before multi-host hardware exists.

Prints LM iters/s and device peak memory. Timing forces a value
transfer (axon block_until_ready is a no-op on the tunneled backend).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from __graft_entry__ import _synthetic_ba_data_sparse
from mpsfm_tpu.ba.solver import solve_ba


def main(n_cams=512, n_pts=131072, iters=20):
    t0 = time.time()
    data = _synthetic_ba_data_sparse(n_cams=n_cams, n_pts=n_pts, track_len=6)
    n_reproj = int(np.asarray(data.r_valid).sum())
    n_depth = int(np.asarray(data.d_valid).sum())
    print(
        f"problem: {n_cams} cams, {n_pts} pts, {n_reproj} reproj + {n_depth} depth obs "
        f"(built in {time.time() - t0:.1f}s)"
    )

    kw = dict(max_iters=iters, rel_tol=0.0)  # solver default CG budget (32, PERF.md r3)
    t0 = time.time()
    _q, _t, _x, _info = solve_ba(data, **kw)
    float(np.asarray(_info["cost"]))  # force execution (dispatch is async)
    print(f"compile+first solve: {time.time() - t0:.1f}s")

    t0 = time.time()
    quat, t, xyz, info = solve_ba(data, **kw)
    cost = float(np.asarray(info["cost"]))  # forces the transfer
    dt = time.time() - t0
    cost0 = float(np.asarray(info["cost0"]))
    print(
        f"large BA: {iters} LM iters in {dt:.2f}s -> {iters / dt:.1f} iters/s, "
        f"cost {cost0:.1f} -> {cost:.1f}, accepted {int(np.asarray(info['accepted']))}"
    )
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    if peak:
        print(f"device peak memory: {peak / 2**20:.0f} MiB")
    else:
        print(f"memory_stats keys: {sorted(stats)}")
    print(
        '{"metric": "large_ba_lm_iters_per_s", "value": %.2f, "unit": "iters/s"}'
        % (iters / dt)
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 512,
        int(sys.argv[2]) if len(sys.argv) > 2 else 131072,
    )
