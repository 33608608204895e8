"""Benchmark: prior-regularized bundle-adjustment throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "median",
"iqr", "runs"}.

The metric is LM iterations/second on a standard synthetic bundle
(64 cameras x 8192 points, ~100k reprojection + 26k depth observations)
— the hot loop the reference runs through Ceres SPARSE_SCHUR on all CPU
threads (SURVEY.md §6). vs_baseline divides by the MEASURED CPU LM of
the same bundle (scripts/bench_cpu_baseline.py: numpy/BLAS dense-Schur
LM, identical residuals/losses, full-work iterations, all host cores),
recorded in BASELINE_CPU.json and BASELINE.md. Fallback if the
measurement file is absent: a conservative 5.0 iters/s Ceres-class
constant.

Variance discipline (VERDICT r4): session/tunnel variance on the axon
backend is ±20%, which swamped round-over-round deltas. The bench now
times >=7 independent solves and reports the MEDIAN (headline value)
plus the interquartile range, so a regression claim needs to clear the
dispersion bar.
"""

import json
import os
import time

import numpy as np

FALLBACK_REF_ITERS_PER_S = 5.0


def cpu_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json")
    try:
        with open(path) as f:
            return float(json.load(f)["cpu_lm_iters_per_s"])
    except (OSError, KeyError, ValueError):
        return FALLBACK_REF_ITERS_PER_S


def main():
    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.ba.dense import densify, solve_ba_dense

    n_cams, n_pts = 64, 8192
    data = densify(_synthetic_ba_data(n_cams=n_cams, n_pts=n_pts), n_cams, n_pts)
    max_iters = 20

    # rel_tol=0 disables the early-exit 'done' latch so every scheduled LM
    # iteration does full work — honest per-iteration throughput.
    kw = dict(max_iters=max_iters, rel_tol=0.0)

    def run_once():
        quat, t, xyz, info = solve_ba_dense(data, **kw)
        # NOTE: jax.block_until_ready does not actually block on the axon
        # backend — force a value transfer to time real execution.
        return float(np.asarray(xyz).sum())

    run_once()  # compile
    run_once()  # one discarded warm run (first post-compile call can drag)
    runs = 7
    samples = []
    for _ in range(runs):
        t0 = time.time()
        run_once()
        samples.append(max_iters / (time.time() - t0))
    median = float(np.median(samples))
    q75, q25 = np.percentile(samples, [75, 25])

    print(
        json.dumps(
            {
                "metric": "ba_lm_iters_per_s_64cam_8kpts",
                "value": round(median, 2),
                "unit": "LM iters/s",
                "vs_baseline": round(median / cpu_baseline(), 2),
                "median": round(median, 2),
                "iqr": round(float(q75 - q25), 2),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
