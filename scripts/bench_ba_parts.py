"""Microbench the BA solver's phases on the real chip.

Each phase is wrapped in a lax.scan with a data dependency between
repeats so the whole chain executes (no CSE), then we force a value
transfer (axon block_until_ready is a no-op) and divide by repeats.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_ba_data
from mpsfm_tpu.ba import losses
from mpsfm_tpu.ba.solver import (
    _assemble,
    _assemble_ne,
    _cost_only,
    _dense_schur_solve,
    inv3x3,
    solve_ba,
)

R = 10


def timed(name, fn, *args):
    out = fn(*args)
    val = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.time()
    out = fn(*args)
    val = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) * 1000
    print(f"{name:28s} {(dt - OVERHEAD) / R:8.2f} ms/rep   (raw {dt:7.1f} ms, chain {R})")
    return val


def chain(f):
    """Repeat f R times with a scalar data dependency."""

    def run(data, eps0):
        def body(eps, _):
            out = f(data, eps)
            s = jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).ravel()[0]
            return eps + 1e-20 * s, s

        eps, ss = jax.lax.scan(body, eps0, None, length=R)
        return ss.sum()

    return jax.jit(run)


def main():
    global OVERHEAD
    data = _synthetic_ba_data(n_cams=64, n_pts=8192)
    C, P = 64, 8192
    eps0 = jnp.asarray(0.0, jnp.float32)

    # measure call overhead with a trivial program
    trivial = jax.jit(lambda d, e: (d.xyz.sum() + e))
    trivial(data, eps0)
    t0 = time.time()
    float(np.asarray(trivial(data, eps0)))
    OVERHEAD = (time.time() - t0) * 1000
    print(f"call overhead: {OVERHEAD:.1f} ms")

    def f_cost(d, eps):
        return _cost_only(d, d.quat, d.t, d.xyz + eps, losses.SOFT_L1, losses.CAUCHY)

    def f_asm(d, eps):
        return _assemble(d, d.quat, d.t, d.xyz + eps, losses.SOFT_L1, losses.CAUCHY)["cost"]

    def f_ne(d, eps):
        Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, T = _assemble_ne(
            d, d.quat, d.t, d.xyz + eps, losses.SOFT_L1, losses.CAUCHY
        )
        tsum = T.sum() if T is not None else 0.0
        return Hcc.sum() + Hpp.sum() + Wr_rows.sum() + Wd_rows.sum() + g_c.sum() + g_p.sum() + tsum

    def f_schur(d, eps):
        Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, T = _assemble_ne(
            d, d.quat, d.t, d.xyz + eps, losses.SOFT_L1, losses.CAUCHY
        )
        dtype = Hcc.dtype
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp_aug = Hpp + 1e-4 * jnp.einsum("pii->pi", Hpp)[:, :, None] * eye3 + 1e-8 * eye3
        Hpp_inv = inv3x3(Hpp_aug)
        dc = jnp.einsum("cii->ci", Hcc)
        Hcc_aug = Hcc + (1e-4 * dc + 1e-8)[:, :, None] * jnp.eye(6, dtype=dtype)
        delta, _ = _dense_schur_solve(T, Hcc_aug, Hpp_inv, g_c)
        return delta.sum()

    timed("cost_only", chain(f_cost), data, eps0)
    timed("assemble", chain(f_asm), data, eps0)
    timed("assemble+NE", chain(f_ne), data, eps0)
    timed("assemble+NE+dense_schur", chain(f_schur), data, eps0)

    # full solve for reference
    kw = dict(max_iters=20, cg_iters=100, rel_tol=0.0)
    solve_ba(data, **kw)
    t0 = time.time()
    q, t, xyz, info = solve_ba(data, **kw)
    float(np.asarray(xyz).sum())
    dt = (time.time() - t0) * 1000
    print(f"{'full solve (20 iters)':28s} {dt / 20:8.2f} ms/iter  (raw {dt:7.1f} ms)")


if __name__ == "__main__":
    main()
