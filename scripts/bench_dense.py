import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
from __graft_entry__ import _synthetic_ba_data
from mpsfm_tpu.ba.dense import densify, solve_ba_dense
from mpsfm_tpu.ba.solver import solve_ba

data = _synthetic_ba_data(n_cams=64, n_pts=8192)
ddata = densify(data, 64, 8192)
kw = dict(max_iters=20, rel_tol=0.0)

def run(d):
    q, t, x, info = solve_ba_dense(d, **kw)
    return float(np.asarray(x).sum()), float(info["cost0"]), float(info["cost"]), int(info["accepted"])

s, c0, c1, acc = run(ddata)  # compile
t0 = time.time()
for _ in range(3):
    s, c0, c1, acc = run(ddata)
dt = (time.time() - t0) / 3
print(f"dense: {20/dt:.1f} iters/s  ({dt*1000/20:.2f} ms/iter)  cost {c0:.1f}->{c1:.1f} acc={acc}")

# sparse comparison, same sizes
kw2 = dict(max_iters=20, cg_iters=100, rel_tol=0.0)
q, t_, x, info = solve_ba(data, **kw2); float(np.asarray(x).sum())
t0 = time.time()
for _ in range(3):
    q, t_, x, info = solve_ba(data, **kw2); s2 = float(np.asarray(x).sum())
dt2 = (time.time() - t0) / 3
print(f"sparse: {20/dt2:.1f} iters/s  ({dt2*1000/20:.2f} ms/iter)  cost {float(info['cost0']):.1f}->{float(info['cost']):.1f}")
