"""Roofline for one LM iteration of the BA solver (VERDICT r4 item 8).

For the two production solve paths — the dense (C,P)-grid path used by
local/medium bundles (bench.py's 64 cam / 8192 pt problem) and the
explicit block-sparse Schur path used by large scenes (512 cam / 131k
pt) — this measures:

  * FLOPs and HBM bytes per LM iteration from XLA's own compiled cost
    model (``compiled.cost_analysis()``), amortized over a 20-iteration
    full-work solve (rel_tol=0 disables the early-exit latch so every
    iteration does assembly + Schur + trial);
  * wall time per iteration (value-transfer-forced timing: axon
    block_until_ready is a no-op);
  * achieved TFLOP/s and GB/s against the v5e chip peaks, the
    arithmetic intensity vs the ridge point, and the speed-of-light
    headroom implied by whichever wall (MXU or HBM) binds.

v5e single-chip peaks used: 197 TFLOP/s bf16 MXU; f32 runs the MXU in
multi-pass at ~1/4 of that (~49 TFLOP/s, the solver computes in f32);
HBM ~819 GB/s. Ridge (f32) ~60 FLOP/byte.

Reference contrast: the reference runs this loop through Ceres
SPARSE_SCHUR on all CPU threads (mpsfm/sfm/mapper/bundle_adjustment.py:
285-293) and publishes no roofline; PERF.md's round-1 estimate for this
repo was "~50x off speed-of-light" — this script replaces that feeling
with a number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

PEAK_F32_FLOPS = 49e12  # v5e MXU f32 (multi-pass) ~= bf16/4
PEAK_HBM_BPS = 819e9

R_ITERS = 20


def _cost_analysis(jitted, *args, **static):
    lowered = jitted.lower(*args, **static)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return ca or {}


def _timed(run, n=5):
    run()  # compile
    run()  # discard first post-compile call
    samples = []
    for _ in range(n):
        t0 = time.time()
        run()
        samples.append(time.time() - t0)
    return float(np.median(samples))


def _report(name, flops_total, bytes_total, wall_s, n_iters):
    flops = flops_total / n_iters
    byts = bytes_total / n_iters
    t_it = wall_s / n_iters
    ach_f = flops / t_it
    ach_b = byts / t_it
    ai = flops / max(byts, 1.0)
    ridge = PEAK_F32_FLOPS / PEAK_HBM_BPS
    t_mxu = flops / PEAK_F32_FLOPS
    t_hbm = byts / PEAK_HBM_BPS
    t_sol = max(t_mxu, t_hbm)
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    print(f"\n== {name} ==")
    print(f"  per LM iteration: {flops/1e9:.2f} GFLOP, {byts/1e6:.1f} MB HBM traffic")
    print(f"  measured: {t_it*1e3:.2f} ms/iter -> {ach_f/1e12:.3f} TFLOP/s, {ach_b/1e9:.1f} GB/s")
    print(
        f"  arithmetic intensity {ai:.1f} FLOP/B (f32 ridge {ridge:.0f}) -> {bound}-bound"
    )
    print(
        f"  speed-of-light {t_sol*1e3:.3f} ms/iter "
        f"({'MXU' if bound=='MXU' else 'HBM'} wall) -> headroom {t_it/t_sol:.1f}x"
    )
    return {
        "name": name,
        "gflop_per_iter": flops / 1e9,
        "mb_per_iter": byts / 1e6,
        "ms_per_iter": t_it * 1e3,
        "achieved_tflops": ach_f / 1e12,
        "achieved_gbps": ach_b / 1e9,
        "bound": bound,
        "headroom_x": t_it / t_sol,
    }


def dense_path():
    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.ba import losses
    from mpsfm_tpu.ba.dense import densify, solve_ba_dense

    data = densify(_synthetic_ba_data(n_cams=64, n_pts=8192), 64, 8192)
    kw = dict(max_iters=R_ITERS, rel_tol=0.0)

    def run():
        quat, t, xyz, info = solve_ba_dense(data, **kw)
        float(np.asarray(xyz).sum())

    wall = _timed(run)
    # solve_ba_dense wraps a jitted core; lower the same call for the cost model
    ca = _cost_analysis(
        jax.jit(
            lambda d: solve_ba_dense(d, **kw)
        ),
        data,
    )
    return _report(
        "dense (C,P) path — 64 cams / 8192 pts (~100k reproj + 26k depth)",
        float(ca.get("flops", 0.0)),
        float(ca.get("bytes accessed", 0.0)),
        wall,
        R_ITERS,
    )


def block_sparse_path():
    from __graft_entry__ import _synthetic_ba_data_sparse
    from mpsfm_tpu.ba.solver import solve_ba

    data = _synthetic_ba_data_sparse(n_cams=512, n_pts=131072, track_len=6)
    kw = dict(max_iters=R_ITERS, rel_tol=0.0)

    def run():
        quat, t, xyz, info = solve_ba(data, **kw)
        float(np.asarray(info["cost"]))

    wall = _timed(run)
    ca = _cost_analysis(jax.jit(lambda d: solve_ba(d, **kw)), data)
    return _report(
        "block-sparse Schur path — 512 cams / 131k pts (~786k reproj + 33k depth)",
        float(ca.get("flops", 0.0)),
        float(ca.get("bytes accessed", 0.0)),
        wall,
        R_ITERS,
    )


def main():
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})")
    rows = []
    rows.append(dense_path())
    rows.append(block_sparse_path())
    print("\n| path | GFLOP/iter | MB/iter | ms/iter | TFLOP/s | GB/s | bound | headroom |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['name'].split(' — ')[0]} | {r['gflop_per_iter']:.2f} | "
            f"{r['mb_per_iter']:.1f} | {r['ms_per_iter']:.2f} | "
            f"{r['achieved_tflops']:.3f} | {r['achieved_gbps']:.1f} | {r['bound']} | "
            f"{r['headroom_x']:.1f}x |"
        )


if __name__ == "__main__":
    main()
