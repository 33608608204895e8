"""Phase microbench of the LARGE (slot-table) BA path on the real chip.

Times, at 512 cams / 131k pts: NE assembly, trial cost, Schur-PCG single
matvec, full PCG solve, reduced-rhs + back-substitution. Guides the
Pallas-fusion work (VERDICT r3 item 2). Timing forces a value transfer
(axon block_until_ready is a no-op).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_ba_data_sparse
from mpsfm_tpu.ba import losses
from mpsfm_tpu.ba.solver import (
    _assemble_ne,
    _cost_only,
    _schur_pcg,
    inv3x3,
    quat_normalize,
)

R = 8


def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.time()
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) * 1000
    print(f"{name:32s} {dt / R:8.2f} ms/rep   (raw {dt:7.1f} ms, chain {R})")


def chain(f):
    def run(data, eps0):
        def body(eps, _):
            out = f(data, eps)
            # consume EVERY output leaf so XLA can't DCE the unused ones
            s = sum(
                jnp.asarray(l, jnp.float32).ravel()[0]
                for l in jax.tree_util.tree_leaves(out)
                if l is not None
            )
            return eps + 1e-20 * s, s

        _eps, ss = jax.lax.scan(body, eps0, None, length=R)
        return ss.sum()

    return jax.jit(run)


def main():
    data = _synthetic_ba_data_sparse(n_cams=512, n_pts=131072, track_len=6)
    No, Nd = data.r_cam.shape[0], data.d_cam.shape[0]
    print(f"512 cams, 131072 pts, {No} reproj rows, {Nd} depth rows")
    RL, DL = losses.SOFT_L1, losses.CAUCHY

    timed("cost_only", chain(lambda d, e: _cost_only(d, d.quat + e, d.t, d.xyz, RL, DL)), data, jnp.asarray(0.0, jnp.float32))
    timed("assemble_ne (all outputs)", chain(lambda d, e: _assemble_ne(d, d.quat + e, d.t, d.xyz, RL, DL)), data, jnp.asarray(0.0, jnp.float32))

    # build NE once for the solve-phase benches
    ne = jax.jit(lambda d: _assemble_ne(d, d.quat, d.t, d.xyz, RL, DL))(data)
    Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, _T = ne
    lam = 1e-4
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    dp = jnp.einsum("pii->pi", Hpp)
    Hpp_aug = Hpp + jnp.einsum("pi,ij->pij", lam * dp + 1e-8, eye3) * eye3
    Hpp_inv = jax.jit(inv3x3)(Hpp_aug)
    dc = jnp.einsum("cii->ci", Hcc)
    eye6 = jnp.eye(6, dtype=dtype)
    Hcc_aug = Hcc + jnp.einsum("ci,ij->cij", lam * dc + 1e-8 + (1 - data.cam_dof), eye6) * eye6

    C = Hcc.shape[0]
    rhs = -g_c

    def one_matvec(d, e):
        x, _ = _schur_pcg(d, Hcc_aug, Hpp_inv, Wr_rows, Wd_rows, rhs + e, 1, 0.0)
        return x

    def full_pcg(d, e):
        x, it = _schur_pcg(d, Hcc_aug, Hpp_inv, Wr_rows, Wd_rows, rhs + e, 32, 1e-4)
        return x

    timed("schur_pcg 1 matvec", chain(one_matvec), data, jnp.asarray(0.0, dtype))
    timed("schur_pcg 32 iters", chain(full_pcg), data, jnp.asarray(0.0, dtype))

    def rhs_backsub(d, e):
        Wr = Wr_rows.reshape(No, 6, 3)
        Wd = Wd_rows.reshape(Nd, 6, 3)
        hp = jnp.einsum("pij,pj->pi", Hpp_inv, g_p + e)
        from mpsfm_tpu.ba.solver import _cam_broadcast_rows

        red_r = (Wr * hp[d.r_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
        red_d = (Wd * hp[d.d_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
        rr = -(g_c - red_r - red_d)
        wtd_r = (Wr * _cam_broadcast_rows(rr, No)[:, :, None]).sum(1)
        wtd_d = (Wd * _cam_broadcast_rows(rr, Nd)[:, :, None]).sum(1)
        wtd = (wtd_r[d.r_pt_slots] * d.r_pt_slot_mask[..., None]).sum(1)
        wtd = wtd + (wtd_d[d.d_pt_slots] * d.d_pt_slot_mask[..., None]).sum(1)
        return -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + wtd)

    timed("reduced-rhs + backsub", chain(rhs_backsub), data, jnp.asarray(0.0, dtype))


if __name__ == "__main__":
    main()
