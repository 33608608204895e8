"""Microbench dense-Schur sub-parts on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_ba_data
from mpsfm_tpu.ba import losses
from mpsfm_tpu.ba.solver import _assemble_ne, inv3x3

R = 10


def chain(f):
    @jax.jit
    def run(eps0, *fixed):
        def body(eps, _):
            out = f(eps, *fixed)
            s = jnp.asarray(out, jnp.float32).ravel()[0]
            return eps + 1e-20 * s, s

        eps, ss = jax.lax.scan(body, eps0, None, length=R)
        return ss.sum()

    return run


def timed(name, fn, *args):
    fn(*args)  # compile
    t0 = time.time()
    out = fn(*args)
    float(np.asarray(out))
    dt = (time.time() - t0) * 1000
    print(f"{name:24s} {dt / R:8.2f} ms/rep  (raw {dt:7.1f} ms)")


def main():
    data = _synthetic_ba_data(n_cams=64, n_pts=8192)
    C, P = 64, 8192
    ne = jax.jit(lambda d: _assemble_ne(d, d.quat, d.t, d.xyz, losses.SOFT_L1, losses.CAUCHY))(data)
    Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, T = [jnp.asarray(x) for x in ne]
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    Hpp_inv = inv3x3(Hpp + 1e-4 * jnp.einsum("pii->pi", Hpp)[:, :, None] * eye3 + 1e-8 * eye3)
    Hcc_aug = Hcc + (1e-4 * jnp.einsum("cii->ci", Hcc) + 1e-8)[:, :, None] * jnp.eye(6, dtype=dtype)
    eps0 = jnp.asarray(0.0, jnp.float32)

    def f_Tgather(eps, Wr, Wd, d):
        TT = (Wr + eps)[d.pc_r_slot] * d.pc_r_mask[..., None]
        TT = TT + Wd[d.pc_d_slot] * d.pc_d_mask[..., None]
        return TT.sum()

    def f_TB(eps, T_, Hinv):
        U = (T_ + eps).reshape(P, C * 6, 3)
        TB = jnp.einsum("pkl,plm->pkm", U, Hinv)
        return TB.sum()

    def f_Sred(eps, T_, Hinv):
        U = (T_ + eps).reshape(P, C * 6, 3)
        TB = jnp.einsum("pkl,plm->pkm", U, Hinv)
        S_red = jax.lax.dot_general(TB, U, (((0, 2), (0, 2)), ((), ())), preferred_element_type=dtype)
        return S_red.sum()

    def f_chol(eps, S):
        Sx = S + eps * jnp.eye(6 * C, dtype=dtype)
        chol = jax.scipy.linalg.cho_factor(Sx + 1e-5 * jnp.eye(6 * C, dtype=dtype))
        x = jax.scipy.linalg.cho_solve(chol, jnp.ones(6 * C, dtype))
        return x.sum()

    S_dummy = np.asarray(jnp.einsum("cij->", Hcc_aug))  # force
    Sfull = jnp.eye(6 * C, dtype=dtype) * 100.0

    timed("T gather", chain(f_Tgather), eps0, Wr_rows, Wd_rows, data)
    timed("TB batched matmul", chain(f_TB), eps0, T, Hpp_inv)
    timed("TB + S_red dot_general", chain(f_Sred), eps0, T, Hpp_inv)
    timed("cholesky 384 + solve", chain(f_chol), eps0, Sfull)


def solver_variants():
    import jax
    import jax.numpy as jnp
    import numpy as np

    C = 64
    n = 6 * C
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32)
    S = jnp.asarray(A @ A.T + n * np.eye(n, dtype=np.float32))
    rhs = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    blocks = jnp.asarray(
        np.stack([np.asarray(S)[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] for i in range(C)])
    )
    eps0 = jnp.asarray(0.0, jnp.float32)

    def f_cho(eps, S_, r_):
        ch = jax.scipy.linalg.cho_factor(S_ + eps * jnp.eye(n, dtype=S_.dtype))
        return jax.scipy.linalg.cho_solve(ch, r_).sum()

    def f_lu(eps, S_, r_):
        return jnp.linalg.solve(S_ + eps * jnp.eye(n, dtype=S_.dtype), r_).sum()

    def f_laxchol(eps, S_, r_):
        L = jax.lax.linalg.cholesky(S_ + eps * jnp.eye(n, dtype=S_.dtype))
        y = jax.lax.linalg.triangular_solve(L, r_[:, None], left_side=True, lower=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)
        return x.sum()

    def f_pcg(eps, S_, r_, blk):
        Sx = S_ + eps * jnp.eye(n, dtype=S_.dtype)
        Lb = jax.lax.linalg.cholesky(blk)  # (C,6,6)

        def prec(v):
            vb = v.reshape(C, 6, 1)
            y = jax.lax.linalg.triangular_solve(Lb, vb, left_side=True, lower=True)
            z = jax.lax.linalg.triangular_solve(Lb, y, left_side=True, lower=True, transpose_a=True)
            return z.reshape(n)

        x = jnp.zeros_like(r_)
        r = r_ - Sx @ x
        z = prec(r)
        p = z
        rz = r @ z

        def body(i, st):
            x, r, p, rz = st
            Sp = Sx @ p
            alpha = rz / (p @ Sp + 1e-30)
            x = x + alpha * p
            r = r - alpha * Sp
            z = prec(r)
            rz2 = r @ z
            p = z + (rz2 / (rz + 1e-30)) * p
            return (x, r, p, rz2)

        x, r, p, rz = jax.lax.fori_loop(0, 40, body, (x, r, p, rz))
        return x.sum()

    timed("solve: cho_factor", chain(f_cho), eps0, S, rhs)
    timed("solve: linalg.solve", chain(f_lu), eps0, S, rhs)
    timed("solve: lax cholesky", chain(f_laxchol), eps0, S, rhs)
    timed("solve: PCG40 blockjac", chain(f_pcg), eps0, S, rhs, blocks)


if __name__ == "__main__":
    import sys as _s
    if "--solvers" in _s.argv:
        solver_variants()
        raise SystemExit
    main()


