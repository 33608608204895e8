"""Batched Levenberg-Marquardt bundle adjustment with Schur-complement PCG.

TPU-native replacement for the reference's Ceres core (SPARSE_SCHUR +
robust losses + the fork's depth bundle adjuster — SURVEY.md §2.3 items
(7),(8); mpsfm/sfm/mapper/bundle_adjustment.py). Design:

  - The problem is a fixed-shape flat-array program: cameras (C,·),
    points (P,3), reprojection observations (No,·), log-depth prior
    observations (Nd,·), all padded with validity masks.
  - Per-observation Jacobians come from forward-mode autodiff of the
    residual at a zero tangent (omega, dt, dX), vmapped over observations.
  - Robust losses enter as IRLS weights rho'(s) (Ceres-equivalent
    re-weighting), magnitudes as outer multipliers.
  - The camera-reduced system S = Hcc − W Hpp⁻¹ Wᵀ is never formed:
    matrix-free PCG with a block-Jacobi preconditioner evaluates S·x via
    two segment-sums per iteration (gather x at obs cameras, reduce over
    point tracks, scatter back) — the sparse-Schur pattern expressed as
    XLA-friendly dense scans. This is also the unit that shards across a
    device mesh (point blocks per device, psum over partial reductions).
  - Gauge fixing by DOF masks: pose0 fully frozen, pose1 tx frozen
    (reference bundle_adjustment.py:111-122) — frozen dims get identity
    rows in H and zero gradient.

Depth residuals are r = log(d_prior) − log(z), weighted d²/σ² with
per-observation Cauchy scale m·σ/d, matching bundle_adjustment.py:159-176.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpsfm_tpu.ba import losses
from mpsfm_tpu.geometry.rotations import quat_mul, quat_normalize, quat_rotate, so3_exp_quat


class BAData(NamedTuple):
    """Padded flat BA problem. See module docstring for semantics."""

    # cameras (C,)
    quat: jnp.ndarray  # (C,4)
    t: jnp.ndarray  # (C,3)
    cam_dof: jnp.ndarray  # (C,6) float 0/1 — per-dim freedom mask
    fx: jnp.ndarray  # (C,)
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # points (P,)
    xyz: jnp.ndarray  # (P,3)
    point_var: jnp.ndarray  # (P,) float 0/1
    # reprojection observations (No,)
    r_cam: jnp.ndarray  # (No,) int32
    r_pt: jnp.ndarray  # (No,) int32
    r_uv: jnp.ndarray  # (No,2)
    r_valid: jnp.ndarray  # (No,) float 0/1
    r_mag: jnp.ndarray  # (No,) loss magnitude (1/kp_std^2)
    r_scale: jnp.ndarray  # (No,) robust scale (px)
    # depth observations (Nd,)
    d_cam: jnp.ndarray
    d_pt: jnp.ndarray
    d_logtarget: jnp.ndarray  # (Nd,) log prior depth
    d_valid: jnp.ndarray
    d_mag: jnp.ndarray  # d^2/sigma^2
    d_scale: jnp.ndarray  # m*sigma/d


def _apply_cam_update(quat, t, delta):
    """delta (C,6): [omega, dt]."""
    dq = so3_exp_quat(delta[:, :3])
    return quat_normalize(quat_mul(dq, quat)), t + delta[:, 3:]


def _reproj_residual(quat, t, X, fx, fy, cx, cy, uv):
    p = quat_rotate(quat, X) + t
    z = p[2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * p[0] / zs + cx
    v = fy * p[1] / zs + cy
    return jnp.stack([u - uv[0], v - uv[1]])


def _depth_residual(quat, t, X, logtarget):
    z = quat_rotate(quat, X)[2] + t[2]
    return jnp.log(jnp.maximum(z, 1e-8)) - logtarget


def inv3x3(M, eps=1e-12):
    """Batched closed-form 3x3 inverse."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([Cc, -(a * h - b * g), a * e - b * d], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _segment_sum(vals, ids, num):
    return jnp.zeros((num, *vals.shape[1:]), vals.dtype).at[ids].add(vals)


def _assemble(data: BAData, quat, t, xyz, reproj_loss: int, depth_loss: int):
    """Residuals, IRLS weights, per-obs Jacobians, and the total cost."""
    C = quat.shape[0]
    P = xyz.shape[0]

    # --- reprojection block ---
    rq = quat[data.r_cam]
    rt = t[data.r_cam]
    rX = xyz[data.r_pt]

    def r_fn(eps9, rq, rt, rX, fx, fy, cx, cy, uv):
        dq = so3_exp_quat(eps9[:3])
        q2 = quat_mul(dq, rq)
        return _reproj_residual(q2, rt + eps9[3:6], rX + eps9[6:9], fx, fy, cx, cy, uv)

    zeros9 = jnp.zeros((data.r_cam.shape[0], 9), dtype=xyz.dtype)
    args = (rq, rt, rX, data.fx[data.r_cam], data.fy[data.r_cam], data.cx[data.r_cam], data.cy[data.r_cam], data.r_uv)
    r_res = jax.vmap(_reproj_residual)(quat_normalize(rq), rt, rX, *args[3:])
    J_r = jax.vmap(jax.jacfwd(r_fn))(zeros9, *args)  # (No,2,9)

    s_r = (r_res**2).sum(-1)
    w_r = data.r_mag * losses.rho_prime(reproj_loss, s_r, data.r_scale) * data.r_valid
    cost_r = (data.r_mag * losses.rho(reproj_loss, s_r, data.r_scale) * data.r_valid).sum()

    # --- depth block ---
    dq_ = quat[data.d_cam]
    dt_ = t[data.d_cam]
    dX_ = xyz[data.d_pt]

    def d_fn(eps9, q0, t0, X0, logtarget):
        dq = so3_exp_quat(eps9[:3])
        return _depth_residual(quat_mul(dq, q0), t0 + eps9[3:6], X0 + eps9[6:9], logtarget)

    zeros9d = jnp.zeros((data.d_cam.shape[0], 9), dtype=xyz.dtype)
    d_res = jax.vmap(_depth_residual)(dq_, dt_, dX_, data.d_logtarget)
    J_d = jax.vmap(jax.grad(d_fn))(zeros9d, dq_, dt_, dX_, data.d_logtarget)  # (Nd,9)

    s_d = d_res**2
    w_d = data.d_mag * losses.rho_prime(depth_loss, s_d, data.d_scale) * data.d_valid
    cost_d = (data.d_mag * losses.rho(depth_loss, s_d, data.d_scale) * data.d_valid).sum()

    # DOF masking.
    J_r = J_r.at[:, :, :6].multiply(data.cam_dof[data.r_cam][:, None, :])
    J_r = J_r.at[:, :, 6:].multiply(data.point_var[data.r_pt][:, None, None])
    J_d = J_d.at[:, :6].multiply(data.cam_dof[data.d_cam])
    J_d = J_d.at[:, 6:].multiply(data.point_var[data.d_pt][:, None])

    return {
        "J_r": J_r,
        "r_res": r_res,
        "w_r": w_r,
        "J_d": J_d,
        "d_res": d_res,
        "w_d": w_d,
        "cost": cost_r + cost_d,
    }


def _normal_equations(data: BAData, asm, C, P):
    J_r, w_r, r_res = asm["J_r"], asm["w_r"], asm["r_res"]
    J_d, w_d, d_res = asm["J_d"], asm["w_d"], asm["d_res"]

    Jc_r, Jp_r = J_r[:, :, :6], J_r[:, :, 6:]
    # Per-obs weighted blocks.
    Hcc_r = jnp.einsum("nri,nrj,n->nij", Jc_r, Jc_r, w_r)
    Hpp_r = jnp.einsum("nri,nrj,n->nij", Jp_r, Jp_r, w_r)
    W_r = jnp.einsum("nri,nrj,n->nij", Jc_r, Jp_r, w_r)  # (No,6,3)
    gc_r = jnp.einsum("nri,nr,n->ni", Jc_r, r_res, w_r)
    gp_r = jnp.einsum("nri,nr,n->ni", Jp_r, r_res, w_r)

    Jc_d, Jp_d = J_d[:, :6], J_d[:, 6:]
    Hcc_d = jnp.einsum("ni,nj,n->nij", Jc_d, Jc_d, w_d)
    Hpp_d = jnp.einsum("ni,nj,n->nij", Jp_d, Jp_d, w_d)
    W_d = jnp.einsum("ni,nj,n->nij", Jc_d, Jp_d, w_d)
    gc_d = jnp.einsum("ni,n,n->ni", Jc_d, d_res, w_d)
    gp_d = jnp.einsum("ni,n,n->ni", Jp_d, d_res, w_d)

    Hcc = _segment_sum(Hcc_r, data.r_cam, C) + _segment_sum(Hcc_d, data.d_cam, C)
    Hpp = _segment_sum(Hpp_r, data.r_pt, P) + _segment_sum(Hpp_d, data.d_pt, P)
    g_c = _segment_sum(gc_r, data.r_cam, C) + _segment_sum(gc_d, data.d_cam, C)
    g_p = _segment_sum(gp_r, data.r_pt, P) + _segment_sum(gp_d, data.d_pt, P)
    return Hcc, Hpp, W_r, W_d, g_c, g_p


def _schur_pcg(data: BAData, Hcc_aug, Hpp_inv, W_r, W_d, rhs, cg_iters: int, cg_tol):
    """PCG on S x = rhs with S = Hcc_aug − W Hpp_inv Wᵀ, matrix-free."""
    C = Hcc_aug.shape[0]
    P = Hpp_inv.shape[0]
    Minv = jnp.linalg.inv(Hcc_aug)  # block-Jacobi preconditioner (C,6,6)

    def S_mv(x):  # x (C,6)
        y_r = jnp.einsum("nij,ni->nj", W_r, x[data.r_cam])  # (No,3)
        y_d = jnp.einsum("nij,ni->nj", W_d, x[data.d_cam])
        yp = _segment_sum(y_r, data.r_pt, P) + _segment_sum(y_d, data.d_pt, P)
        zp = jnp.einsum("pij,pj->pi", Hpp_inv, yp)
        back_r = jnp.einsum("nij,nj->ni", W_r, zp[data.r_pt])
        back_d = jnp.einsum("nij,nj->ni", W_d, zp[data.d_pt])
        back = _segment_sum(back_r, data.r_cam, C) + _segment_sum(back_d, data.d_cam, C)
        return jnp.einsum("cij,cj->ci", Hcc_aug, x) - back

    def prec(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs - S_mv(x0)
    z0 = prec(r0)
    p0 = z0
    rz0 = (r0 * z0).sum()
    rhs_norm = jnp.sqrt((rhs * rhs).sum()) + 1e-30

    def body(state):
        x, r, p, rz, it = state
        Sp = S_mv(p)
        denom = (p * Sp).sum()
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Sp
        z = prec(r)
        rz_new = (r * z).sum()
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    def cond(state):
        x, r, p, rz, it = state
        return (it < cg_iters) & (jnp.sqrt((r * r).sum()) > cg_tol * rhs_norm)

    x, r, _, _, it = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x, it


@partial(jax.jit, static_argnames=("reproj_loss", "depth_loss", "max_iters", "cg_iters"))
def solve_ba(
    data: BAData,
    reproj_loss: int = losses.SOFT_L1,
    depth_loss: int = losses.CAUCHY,
    max_iters: int = 20,
    cg_iters: int = 100,
    cg_tol: float = 1e-6,
    lm_lambda0: float = 1e-4,
    rel_tol: float = 1e-6,
):
    """Run LM. Returns (quat, t, xyz, info dict)."""
    C = data.quat.shape[0]
    P = data.xyz.shape[0]
    dtype = data.xyz.dtype

    def cost_of(quat, t, xyz):
        return _assemble(data, quat, t, xyz, reproj_loss, depth_loss)["cost"]

    def step(carry, _):
        quat, t, xyz, lam, cost, done, accepted = carry

        asm = _assemble(data, quat, t, xyz, reproj_loss, depth_loss)
        Hcc, Hpp, W_r, W_d, g_c, g_p = _normal_equations(data, asm, C, P)

        # LM augmentation (Marquardt scaling) + identity rows for frozen dims.
        dc = jnp.einsum("cii->ci", Hcc)
        dp = jnp.einsum("pii->pi", Hpp)
        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        frozen_c = 1.0 - data.cam_dof  # (C,6)
        Hcc_aug = Hcc + jnp.einsum("ci,ij->cij", lam * dc + 1e-8 + frozen_c, eye6) * eye6
        frozen_p = 1.0 - data.point_var
        Hpp_aug = Hpp + jnp.einsum("pi,ij->pij", lam * dp + 1e-8 + frozen_p[:, None] * jnp.ones(3, dtype), eye3) * eye3
        Hpp_inv = inv3x3(Hpp_aug)

        # Reduced RHS: -(g_c − W Hpp⁻¹ g_p)
        hp = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)
        red_r = jnp.einsum("nij,nj->ni", W_r, hp[data.r_pt])
        red_d = jnp.einsum("nij,nj->ni", W_d, hp[data.d_pt])
        rhs = -(g_c - _segment_sum(red_r, data.r_cam, C) - _segment_sum(red_d, data.d_cam, C))

        delta_c, cg_used = _schur_pcg(data, Hcc_aug, Hpp_inv, W_r, W_d, rhs, cg_iters, cg_tol)
        delta_c = delta_c * data.cam_dof

        # Back-substitution: Δp = −Hpp⁻¹ (g_p + Wᵀ Δc)
        wtd_r = jnp.einsum("nij,ni->nj", W_r, delta_c[data.r_cam])
        wtd_d = jnp.einsum("nij,ni->nj", W_d, delta_c[data.d_cam])
        wtd = _segment_sum(wtd_r, data.r_pt, P) + _segment_sum(wtd_d, data.d_pt, P)
        delta_p = -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + wtd) * data.point_var[:, None]

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
        return (quat, t, xyz, lam, cost, done, accepted), (cost, cg_used)

    cost0 = cost_of(data.quat, data.t, data.xyz)
    init = (data.quat, data.t, data.xyz, jnp.asarray(lm_lambda0, dtype), cost0, jnp.asarray(False), jnp.asarray(0, jnp.int32))
    (quat, t, xyz, lam, cost, done, accepted), (cost_hist, cg_hist) = jax.lax.scan(
        step, init, None, length=max_iters
    )
    info = {
        "cost0": cost0,
        "cost": cost,
        "accepted": accepted,
        "cost_history": cost_hist,
        "cg_iters": cg_hist,
    }
    return quat, t, xyz, info
