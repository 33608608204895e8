"""Dense cross-product bundle adjustment: the gather-free TPU path.

When C·P is small enough (local bundles, medium global bundles — the
regime where the reference runs Ceres SPARSE_SCHUR, SURVEY.md §3.4), the
whole LM iteration is expressed on dense (C, P) observation grids with a
validity weight of 0 for absent observations:

  * per-observation residuals/Jacobians: elementwise (C,P) math from
    broadcast camera rows (C,1) and point columns (1,P) — NO gathers;
  * per-camera reductions: lane-axis sums; per-point: sublane-axis sums;
  * the camera-point coupling blocks W(c,p) ARE the dense-Schur coupling
    T — no slot tables; S_red is one MXU (6C, 3P)x(3P, 6C) dot_general.

Measured on v5e this removes the three dominant costs of the sparse
layout (row-gather segment sums ~14ms, T gather ~18ms, batched TB ~7ms).
Semantics match solver.solve_ba exactly (same residuals, robust losses,
gauge fixing, LM schedule); sparse BAData remains the path for problems
too large for dense grids and for the observation-sharded distributed
solver.

Reference parity: replaces pycolmap.create_default_bundle_adjuster +
create_depth_bundle_adjuster + pyceres.solve
(mpsfm/sfm/mapper/bundle_adjustment.py:67-293).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpsfm_tpu.ba import losses
from mpsfm_tpu.geometry.rotations import quat_normalize
from mpsfm_tpu.ba.solver import _apply_cam_update, _rotmat_cols, inv3x3


import os


_BF16_COUPLING = os.environ.get("MPSFM_BA_BF16", "0") == "1"


def _use_pallas_chol(K: int) -> bool:
    """Optional: route the reduced-system solve through the fused Pallas
    Cholesky (MPSFM_PALLAS_CHOL=1). Standalone it beats XLA's blocked
    cho_factor 2.2x (3.9 vs 8.3 ms at K=384 on v5e), but inside the LM
    scan XLA overlaps the factorization with independent work and the
    end-to-end solve is ~13% faster WITHOUT the kernel — so default off;
    kept for the panelized/MXU variant and for standalone solves."""
    if os.environ.get("MPSFM_PALLAS_CHOL", "0") != "1":
        return False
    from mpsfm_tpu.ba.pallas_cholesky import on_tpu

    return K <= 1024 and on_tpu()


class DenseBAData(NamedTuple):
    """Dense (C, P) BA problem. Invalid observations carry weight 0."""

    quat: jnp.ndarray  # (C,4)
    t: jnp.ndarray  # (C,3)
    cam_dof: jnp.ndarray  # (C,6)
    fx: jnp.ndarray  # (C,)
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    xyz: jnp.ndarray  # (P,3)
    point_var: jnp.ndarray  # (P,)
    uv_x: jnp.ndarray  # (C,P) observed keypoint x
    uv_y: jnp.ndarray  # (C,P) observed keypoint y
    r_w: jnp.ndarray  # (C,P) magnitude * valid (1/kp_std², 0 if absent)
    r_scale: jnp.ndarray  # (C,P) robust loss scale
    d_logt: jnp.ndarray  # (C,P) log prior depth target
    d_w: jnp.ndarray  # (C,P) d²/σ² * valid
    d_scale: jnp.ndarray  # (C,P) robust scale m·σ/d


def _project(data: DenseBAData, quat, t, xyz):
    """Dense (C,P) camera-frame coords + residuals."""
    R = _rotmat_cols(quat)  # 9 x (C,)
    Rb = [r[:, None] for r in R]
    tb = [t[:, k][:, None] for k in range(3)]
    X0, X1, X2 = xyz[:, 0][None, :], xyz[:, 1][None, :], xyz[:, 2][None, :]
    px = Rb[0] * X0 + Rb[1] * X1 + Rb[2] * X2 + tb[0]
    py = Rb[3] * X0 + Rb[4] * X1 + Rb[5] * X2 + tb[1]
    pz = Rb[6] * X0 + Rb[7] * X1 + Rb[8] * X2 + tb[2]
    return Rb, tb, px, py, pz


def _cost_only(data: DenseBAData, quat, t, xyz, reproj_loss: int, depth_loss: int):
    quat = quat_normalize(quat)
    Rb, tb, px, py, pz = _project(data, quat, t, xyz)
    inv_z = 1.0 / jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    ru = data.fx[:, None] * px * inv_z + data.cx[:, None] - data.uv_x
    rv = data.fy[:, None] * py * inv_z + data.cy[:, None] - data.uv_y
    s_r = ru * ru + rv * rv
    cost = (data.r_w * losses.rho(reproj_loss, s_r, data.r_scale)).sum()
    d_res = jnp.log(jnp.maximum(pz, 1e-8)) - data.d_logt
    cost += (data.d_w * losses.rho(depth_loss, d_res * d_res, data.d_scale)).sum()
    return cost


def _assemble_ne_dense(data: DenseBAData, quat, t, xyz, reproj_loss: int, depth_loss: int):
    """Returns (Hcc (C,6,6), g_c (C,6), hpp entries 6x(P,), g_p (P,3),
    Tflat (6C, 3, P)) — everything needed for the λ loop, gather-free."""
    quat = quat_normalize(quat)
    C = quat.shape[0]
    P = xyz.shape[0]
    Rb, tb, px, py, pz = _project(data, quat, t, xyz)

    pzs = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    inv_z = 1.0 / pzs
    fxb, fyb = data.fx[:, None], data.fy[:, None]
    ru = fxb * px * inv_z + data.cx[:, None] - data.uv_x
    rv = fyb * py * inv_z + data.cy[:, None] - data.uv_y
    s_r = ru * ru + rv * rv
    w_r = data.r_w * losses.rho_prime(reproj_loss, s_r, data.r_scale)

    a0 = fxb * inv_z
    a2 = -fxb * px * inv_z * inv_z
    b1 = fyb * inv_z
    b2 = -fyb * py * inv_z * inv_z
    qx = px - tb[0]
    qy = py - tb[1]
    qz = pz - tb[2]
    zeros = jnp.zeros_like(px)
    dof = [data.cam_dof[:, k][:, None] for k in range(6)]
    pv = data.point_var[None, :]
    ju = [
        (a2 * qy) * dof[0], (a0 * qz - a2 * qx) * dof[1], (-a0 * qy) * dof[2],
        a0 * dof[3], zeros, a2 * dof[5],
    ]
    jv = [
        (b2 * qy - b1 * qz) * dof[0], (-b2 * qx) * dof[1], (b1 * qx) * dof[2],
        zeros, b1 * dof[4], b2 * dof[5],
    ]
    jpu = [(a0 * Rb[0] + a2 * Rb[6]) * pv, (a0 * Rb[1] + a2 * Rb[7]) * pv, (a0 * Rb[2] + a2 * Rb[8]) * pv]
    jpv = [(b1 * Rb[3] + b2 * Rb[6]) * pv, (b1 * Rb[4] + b2 * Rb[7]) * pv, (b1 * Rb[5] + b2 * Rb[8]) * pv]

    # depth side (shares px..pz)
    pzc = jnp.maximum(pz, 1e-8)
    d_res = jnp.log(pzc) - data.d_logt
    w_d = data.d_w * losses.rho_prime(depth_loss, d_res * d_res, data.d_scale)
    inv_zd = jnp.where(pz > 1e-8, 1.0 / pzc, 0.0)
    jd = [(inv_zd * qy) * dof[0], (-inv_zd * qx) * dof[1], zeros, zeros, zeros, inv_zd * dof[5]]
    jpd = [inv_zd * Rb[6] * pv, inv_zd * Rb[7] * pv, inv_zd * Rb[8] * pv]

    hcc = {}
    for i in range(6):
        for j in range(i, 6):
            hcc[(i, j)] = (w_r * (ju[i] * ju[j] + jv[i] * jv[j]) + w_d * (jd[i] * jd[j])).sum(-1)
    Hcc = jnp.stack(
        [jnp.stack([hcc[(min(i, j), max(i, j))] for j in range(6)], -1) for i in range(6)], -2
    )
    g_c = jnp.stack(
        [(w_r * (ju[i] * ru + jv[i] * rv) + w_d * (jd[i] * d_res)).sum(-1) for i in range(6)], -1
    )

    hpp = {}
    for i in range(3):
        for j in range(i, 3):
            hpp[(i, j)] = (w_r * (jpu[i] * jpu[j] + jpv[i] * jpv[j]) + w_d * (jpd[i] * jpd[j])).sum(0)
    g_p = jnp.stack(
        [(w_r * (jpu[i] * ru + jpv[i] * rv) + w_d * (jpd[i] * d_res)).sum(0) for i in range(3)], -1
    )

    # coupling blocks, stacked (6C, 3, P): k = c*6 + i ordering via stack axes
    Tflat = jnp.stack(
        [
            jnp.stack([w_r * (ju[i] * jpu[m] + jv[i] * jpv[m]) + w_d * (jd[i] * jpd[m]) for m in range(3)], 1)
            for i in range(6)
        ],
        1,
    )  # (C, 6, 3, P)
    Tflat = Tflat.reshape(C * 6, 3, P)
    hpp6 = jnp.stack([hpp[(0, 0)], hpp[(0, 1)], hpp[(0, 2)], hpp[(1, 1)], hpp[(1, 2)], hpp[(2, 2)]], 0)
    return Hcc, g_c, hpp6, g_p, Tflat


@partial(jax.jit, static_argnames=("reproj_loss", "depth_loss", "max_iters"))
def solve_ba_dense(
    data: DenseBAData,
    reproj_loss: int = losses.SOFT_L1,
    depth_loss: int = losses.CAUCHY,
    max_iters: int = 20,
    lm_lambda0: float = 1e-4,
    rel_tol: float = 1e-6,
):
    """LM with dense-Schur direct solve. Returns (quat, t, xyz, info)."""
    C = data.quat.shape[0]
    P = data.xyz.shape[0]
    dtype = data.xyz.dtype
    K = 6 * C

    def cost_of(quat, t, xyz):
        return _cost_only(data, quat, t, xyz, reproj_loss, depth_loss)

    def ne_of(quat, t, xyz):
        return _assemble_ne_dense(data, quat, t, xyz, reproj_loss, depth_loss)

    eyeK = jnp.eye(K, dtype=dtype)
    ii = jnp.arange(C)

    def step(carry):
        it, quat, t, xyz, lam, cost, done, accepted, ne, hist = carry
        Hcc, g_c, hpp6, g_p, Tflat = ne

        # LM augmentation
        frozen_c = 1.0 - data.cam_dof
        dc = jnp.einsum("cii->ci", Hcc)
        Hcc_aug = Hcc + jnp.einsum("ci,ij->cij", lam * dc + 1e-8 + frozen_c, jnp.eye(6, dtype=dtype)) * jnp.eye(
            6, dtype=dtype
        )
        frozen_p = 1.0 - data.point_var
        s00, s01, s02, s11, s12, s22 = hpp6
        a00 = s00 * (1 + lam) + 1e-8 + frozen_p
        a11 = s11 * (1 + lam) + 1e-8 + frozen_p
        a22 = s22 * (1 + lam) + 1e-8 + frozen_p
        Hpp_aug = jnp.stack(
            [
                jnp.stack([a00, s01, s02], -1),
                jnp.stack([s01, a11, s12], -1),
                jnp.stack([s02, s12, a22], -1),
            ],
            -2,
        )  # (P,3,3)
        Hpp_inv = inv3x3(Hpp_aug)

        # TB (K,3,P): contract T with Hpp_inv per point (9 dense madds).
        # The coupling tensors are the byte giants of the iteration
        # (K·3·P f32 = 38 MB at 64 cams/8k pts, each read 3x per λ-step;
        # roofline: HBM-bound at 7 FLOP/B) — optionally carried in bf16
        # with f32 MXU accumulation (MPSFM_BA_BF16, halves the traffic;
        # the LM direction degrades ~1e-3 relatively, acceptance stays
        # cost-gated in f32).
        Tc = Tflat.astype(jnp.bfloat16) if _BF16_COUPLING else Tflat
        Bt = Hpp_inv.transpose(1, 2, 0).astype(Tc.dtype)  # (3,3,P)
        TB = jnp.stack(
            [
                Tc[:, 0] * Bt[0, m][None] + Tc[:, 1] * Bt[1, m][None] + Tc[:, 2] * Bt[2, m][None]
                for m in range(3)
            ],
            1,
        )  # (K,3,P)

        # rhs = -(g_c - T Hpp⁻¹ g_p)
        hp = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)  # (P,3)
        hpT = hp.T  # (3,P)
        red = (
            Tflat[:, 0] * hpT[0][None] + Tflat[:, 1] * hpT[1][None] + Tflat[:, 2] * hpT[2][None]
        ).sum(-1)  # (K,)
        rhs = -(g_c.reshape(K) - red)

        # S = Hcc_aug (block diag) − TB · Tᵀ  (one MXU contraction)
        S_red = jax.lax.dot_general(TB, Tc, (((1, 2), (1, 2)), ((), ())), preferred_element_type=dtype)
        Hcc_full = jnp.zeros((C, 6, C, 6), dtype).at[ii, :, ii, :].set(Hcc_aug).reshape(K, K)
        S = Hcc_full - S_red
        if _use_pallas_chol(K):
            from mpsfm_tpu.ba.pallas_cholesky import cholesky_solve

            dflat = cholesky_solve(S + 1e-7 * eyeK, rhs)
        else:
            chol = jax.scipy.linalg.cho_factor(S + 1e-7 * eyeK)
            dflat = jax.scipy.linalg.cho_solve(chol, rhs)
        delta_c = dflat.reshape(C, 6) * data.cam_dof
        dflat = delta_c.reshape(K)

        # back-substitution: Δp = −Hpp⁻¹ (g_p + Tᵀ Δc)
        wtd = jax.lax.dot_general(
            dflat.astype(Tc.dtype), Tc, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )  # (3,P)
        delta_p = -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + wtd.T) * data.point_var[:, None]

        quat_new, t_new = _apply_cam_update(quat, t, delta_c)
        xyz_new = xyz + delta_p
        new_cost = cost_of(quat_new, t_new, xyz_new)

        improved = (new_cost < cost) & jnp.isfinite(new_cost)
        take = improved & ~done
        quat = jnp.where(take, quat_new, quat)
        t = jnp.where(take, t_new, t)
        xyz = jnp.where(take, xyz_new, xyz)
        lam = jnp.where(done, lam, jnp.where(improved, jnp.maximum(lam / 3.0, 1e-10), jnp.minimum(lam * 10.0, 1e6)))
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = done | (improved & (rel < rel_tol))
        cost = jnp.where(take, new_cost, cost)
        accepted = accepted + take.astype(jnp.int32)
        ne = jax.lax.cond(take, lambda: ne_of(quat, t, xyz), lambda: ne)
        hist = hist.at[it].set(cost)
        return (it + 1, quat, t, xyz, lam, cost, done, accepted, ne, hist)

    cost0 = cost_of(data.quat, data.t, data.xyz)
    init = (
        jnp.asarray(0, jnp.int32),
        data.quat,
        data.t,
        data.xyz,
        jnp.asarray(lm_lambda0, dtype),
        cost0,
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        ne_of(data.quat, data.t, data.xyz),
        jnp.full((max_iters,), cost0, dtype),
    )
    # while_loop (not scan): converged solves EXIT instead of burning the
    # remaining scheduled iterations' trial evaluations — the mapper runs
    # ~130 solves per scene and most converge in well under max_iters.
    _it, quat, t, xyz, lam, cost, done, accepted, _ne, cost_hist = jax.lax.while_loop(
        lambda c: (c[0] < max_iters) & ~c[6], step, init
    )
    info = {"cost0": cost0, "cost": cost, "accepted": accepted, "cost_history": cost_hist}
    return quat, t, xyz, info


def densify(data, C: int, P: int) -> DenseBAData:
    """Build DenseBAData from a (host or device) sparse BAData — scatter
    camera-major observations into (C,P) grids. Host-side numpy."""
    import numpy as np

    r_cam = np.asarray(data.r_cam)
    r_pt = np.asarray(data.r_pt)
    valid = np.asarray(data.r_valid) > 0
    uv = np.zeros((C, P, 2), np.float32)
    r_w = np.zeros((C, P), np.float32)
    r_scale = np.ones((C, P), np.float32)
    uv[r_cam[valid], r_pt[valid]] = np.asarray(data.r_uv)[valid]
    r_w[r_cam[valid], r_pt[valid]] = np.asarray(data.r_mag)[valid]
    r_scale[r_cam[valid], r_pt[valid]] = np.asarray(data.r_scale)[valid]

    d_cam = np.asarray(data.d_cam)
    d_pt = np.asarray(data.d_pt)
    dvalid = np.asarray(data.d_valid) > 0
    d_logt = np.zeros((C, P), np.float32)
    d_w = np.zeros((C, P), np.float32)
    d_scale = np.ones((C, P), np.float32)
    d_logt[d_cam[dvalid], d_pt[dvalid]] = np.asarray(data.d_logtarget)[dvalid]
    d_w[d_cam[dvalid], d_pt[dvalid]] = np.asarray(data.d_mag)[dvalid]
    d_scale[d_cam[dvalid], d_pt[dvalid]] = np.asarray(data.d_scale)[dvalid]

    return DenseBAData(
        quat=jnp.asarray(data.quat),
        t=jnp.asarray(data.t),
        cam_dof=jnp.asarray(data.cam_dof),
        fx=jnp.asarray(data.fx),
        fy=jnp.asarray(data.fy),
        cx=jnp.asarray(data.cx),
        cy=jnp.asarray(data.cy),
        xyz=jnp.asarray(data.xyz),
        point_var=jnp.asarray(data.point_var),
        uv_x=jnp.asarray(uv[..., 0]),
        uv_y=jnp.asarray(uv[..., 1]),
        r_w=jnp.asarray(r_w),
        r_scale=jnp.asarray(r_scale),
        d_logt=jnp.asarray(d_logt),
        d_w=jnp.asarray(d_w),
        d_scale=jnp.asarray(d_scale),
    )
