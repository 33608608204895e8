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
from mpsfm_tpu.ba.schur_sparse import (
    BlockSchurTables,
    build_schur_blocks,
    make_block_schur_tables,
    pm_backsub,
    pm_coupling_table,
    pm_reduced_rhs,
    schur_cg_blocks,
)
from mpsfm_tpu.geometry.rotations import quat_mul, quat_normalize, quat_rotate, so3_exp_quat


class BAData(NamedTuple):
    """Padded flat BA problem. See module docstring for semantics.

    TPU reduction layout (scatter-add is serialized on TPU, so none is
    used anywhere):

      * observations are **camera-major padded**: No = C * Sc with the
        rows [c*Sc, (c+1)*Sc) belonging to camera c (padding rows have
        valid=0). Per-camera reductions are dense reshape-sums.
      * per-point reductions go through the host-precomputed slot table
        ``r_pt_slots[p, k]`` (index of the k-th observation of point p;
        padded entries masked by ``r_pt_slot_mask``): gather + axis-sum.
    """

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
    # point-reduction slot tables (gather-based segment sums)
    r_pt_slots: jnp.ndarray  # (P, Tp) int32 into reproj obs
    r_pt_slot_mask: jnp.ndarray  # (P, Tp) f32
    d_pt_slots: jnp.ndarray  # (P, Tdp)
    d_pt_slot_mask: jnp.ndarray
    # per-(point, camera) slot tables for the dense-Schur coupling blocks
    # T[p,c] (a point is observed at most once per camera, so one slot
    # suffices). Optional: None => matrix-free PCG path only.
    pc_r_slot: jnp.ndarray | None = None  # (P, C) int32 into reproj obs
    pc_r_mask: jnp.ndarray | None = None  # (P, C) f32
    pc_d_slot: jnp.ndarray | None = None  # (P, C) int32 into depth obs
    pc_d_mask: jnp.ndarray | None = None  # (P, C) f32
    # explicit block-sparse Schur structure for the large-scene path
    # (ba/schur_sparse.py). Optional: None => matrix-free PCG.
    bs: "BlockSchurTables | None" = None


def make_slot_tables(ids: "np.ndarray", num_segments: int, pad_width: int | None = None):
    """Host helper: (slots (num_segments, K), mask) such that
    (vals[slots] * mask).sum(1) segment-sums vals. Padded entries point
    at index 0 and are masked (gathered values must be finite)."""
    import numpy as np

    ids = np.asarray(ids, np.int64)
    counts = np.bincount(ids, minlength=num_segments) if len(ids) else np.zeros(num_segments, np.int64)
    K = int(counts.max()) if len(ids) else 1
    K = max(K, 1)
    if pad_width is not None:
        K = max(K, pad_width)
    slots = np.zeros((num_segments, K), np.int32)
    mask = np.zeros((num_segments, K), np.float32)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    starts = np.searchsorted(sorted_ids, np.arange(num_segments))
    for s in range(num_segments):
        c = counts[s]
        if c:
            slots[s, :c] = order[starts[s] : starts[s] + c]
            mask[s, :c] = 1.0
    return slots, mask


def make_pc_tables(pt_ids, valid, num_points: int, num_cams: int, rows_per_cam: int):
    """Host helper: per-(point, camera) slot tables for camera-major obs.

    Obs row n belongs to camera n // rows_per_cam; a point appears at most
    once per camera (SfM track invariant), so T[p,c] = W_rows[pc_slot[p,c]]
    masked — one row gather replaces the (P,K,C) one-hot contraction."""
    import numpy as np

    slot = np.zeros((num_points, num_cams), np.int32)
    mask = np.zeros((num_points, num_cams), np.float32)
    n = np.where(np.asarray(valid) > 0)[0]
    p = np.asarray(pt_ids)[n]
    c = n // rows_per_cam
    if len(n) and len(np.unique(p.astype(np.int64) * num_cams + c)) != len(n):
        return None, None  # invariant violated: caller falls back to PCG
    slot[p, c] = n
    mask[p, c] = 1.0
    return slot, mask


def _seg_reduce(vals, slots, mask):
    """Segment sum via gather: vals (N, ...), slots (S, K) -> (S, ...)."""
    g = vals[slots]  # (S, K, ...)
    m = mask.reshape(*mask.shape, *([1] * (vals.ndim - 1)))
    return (g * m).sum(axis=1)


def _cam_reduce(vals, C):
    """Per-camera segment sum for camera-major padded obs: dense reshape."""
    return vals.reshape(C, -1, *vals.shape[1:]).sum(axis=1)


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


def _rotmat_cols(quat):
    """Rotation matrix entries of (C,4) quats as 9 (C,) arrays (row-major)."""
    w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def _cost_only(data: BAData, quat, t, xyz, reproj_loss: int, depth_loss: int):
    """Residuals + robust cost without Jacobians (trial-step evaluation:
    roughly half the assembly work of _assemble)."""
    quat = quat_normalize(quat)
    No = data.r_cam.shape[0]
    Nd = data.d_cam.shape[0]
    R = _rotmat_cols(quat)

    Re = [_cam_expand_last(r, No) for r in R]
    te = [_cam_expand_last(t[:, k], No) for k in range(3)]
    X = xyz[data.r_pt]
    px = Re[0] * X[:, 0] + Re[1] * X[:, 1] + Re[2] * X[:, 2] + te[0]
    py = Re[3] * X[:, 0] + Re[4] * X[:, 1] + Re[5] * X[:, 2] + te[1]
    pz = Re[6] * X[:, 0] + Re[7] * X[:, 1] + Re[8] * X[:, 2] + te[2]
    inv_z = 1.0 / jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    fxe = _cam_expand_last(data.fx, No)
    fye = _cam_expand_last(data.fy, No)
    ru = fxe * px * inv_z + _cam_expand_last(data.cx, No) - data.r_uv[:, 0]
    rv = fye * py * inv_z + _cam_expand_last(data.cy, No) - data.r_uv[:, 1]
    s_r = ru * ru + rv * rv
    cost = (data.r_mag * losses.rho(reproj_loss, s_r, data.r_scale) * data.r_valid).sum()

    Re_d = [_cam_expand_last(r, Nd) for r in R]
    te_d = [_cam_expand_last(t[:, k], Nd) for k in range(3)]
    Xd = xyz[data.d_pt]
    pzd = Re_d[6] * Xd[:, 0] + Re_d[7] * Xd[:, 1] + Re_d[8] * Xd[:, 2] + te_d[2]
    d_res = jnp.log(jnp.maximum(pzd, 1e-8)) - data.d_logtarget
    s_d = d_res * d_res
    cost += (data.d_mag * losses.rho(depth_loss, s_d, data.d_scale) * data.d_valid).sum()
    return cost


def _assemble(data: BAData, quat, t, xyz, reproj_loss: int, depth_loss: int):
    """Residuals, IRLS weights, analytic Jacobians, and the total cost.

    Everything is structure-of-arrays with the observation axis LAST
    (TPU lane dim): residual/Jacobian entries are built as (No,)
    component vectors and stacked straight into the (2,9,No)/(9,Nd)
    layouts the reductions consume — no autodiff dual numbers, no
    minor-dim transposes (both measured as the dominant cost).

    Jacobian derivation (left-perturbation R' = exp(ω)R, t' = t + dt):
      p = R X + t;  ∂p/∂ω = -[p - t]_x;  ∂p/∂dt = I;  ∂p/∂X = R
      r = (fx px/pz + cx - u, fy py/pz + cy - v)
      ∂r/∂p = [[fx/pz, 0, -fx px/pz²], [0, fy/pz, -fy py/pz²]]
      depth: r = log(pz) - log d;  ∂r/∂p = (0, 0, 1/pz).
    """
    quat = quat_normalize(quat)
    C = quat.shape[0]
    No = data.r_cam.shape[0]
    Nd = data.d_cam.shape[0]
    dtype = xyz.dtype

    R = _rotmat_cols(quat)  # 9 x (C,)

    def block(Nn, pt_idx, fx_c, fy_c, cx_c, cy_c):
        Re = [_cam_expand_last(r, Nn) for r in R]  # 9 x (Nn,)
        te = [_cam_expand_last(t[:, k], Nn) for k in range(3)]
        X = xyz[pt_idx]  # (Nn,3) point gather (unavoidable)
        X0, X1, X2 = X[:, 0], X[:, 1], X[:, 2]
        px = Re[0] * X0 + Re[1] * X1 + Re[2] * X2 + te[0]
        py = Re[3] * X0 + Re[4] * X1 + Re[5] * X2 + te[1]
        pz = Re[6] * X0 + Re[7] * X1 + Re[8] * X2 + te[2]
        return Re, te, px, py, pz

    # ---------------- reprojection ----------------
    fxe = _cam_expand_last(data.fx, No)
    fye = _cam_expand_last(data.fy, No)
    cxe = _cam_expand_last(data.cx, No)
    cye = _cam_expand_last(data.cy, No)
    Re, te, px, py, pz = block(No, data.r_pt, fxe, fye, cxe, cye)
    pzs = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    inv_z = 1.0 / pzs
    ru = fxe * px * inv_z + cxe - data.r_uv[:, 0]
    rv = fye * py * inv_z + cye - data.r_uv[:, 1]
    r_res = jnp.stack([ru, rv], axis=-1)  # (No,2) (consumers use small dims)

    s_r = ru * ru + rv * rv
    w_r = data.r_mag * losses.rho_prime(reproj_loss, s_r, data.r_scale) * data.r_valid
    cost_r = (data.r_mag * losses.rho(reproj_loss, s_r, data.r_scale) * data.r_valid).sum()

    # ∂r/∂p rows
    a0 = fxe * inv_z
    a2 = -fxe * px * inv_z * inv_z
    b1 = fye * inv_z
    b2 = -fye * py * inv_z * inv_z
    # p - t (for ∂p/∂ω = -[p-t]_x)
    qx = px - te[0]
    qy = py - te[1]
    qz = pz - te[2]
    zeros = jnp.zeros_like(px)

    def drdomega(a0_, a1_, a2_):
        # row a times -[q]_x: ((-[q]x)_ij = [[0,qz,-qy],[-qz,0,qx],[qy,-qx,0]])
        # => (a·M) = (a2*qy - a1*qz, a0*qz - a2*qx, a1*qx - a0*qy)
        return (
            a2_ * qy - a1_ * qz,
            a0_ * qz - a2_ * qx,
            a1_ * qx - a0_ * qy,
        )

    def drdX(a0_, a1_, a2_):
        # row times R
        return (
            a0_ * Re[0] + a1_ * Re[3] + a2_ * Re[6],
            a0_ * Re[1] + a1_ * Re[4] + a2_ * Re[7],
            a0_ * Re[2] + a1_ * Re[5] + a2_ * Re[8],
        )

    rowu_w = drdomega(a0, zeros, a2)
    rowv_w = drdomega(zeros, b1, b2)
    rowu_X = drdX(a0, zeros, a2)
    rowv_X = drdX(zeros, b1, b2)
    dof = [_cam_expand_last(data.cam_dof[:, k], No) for k in range(6)]
    pv_r = data.point_var[data.r_pt]
    J_r = jnp.stack(
        [
            jnp.stack(
                [rowu_w[0] * dof[0], rowu_w[1] * dof[1], rowu_w[2] * dof[2],
                 a0 * dof[3], zeros * dof[4], a2 * dof[5],
                 rowu_X[0] * pv_r, rowu_X[1] * pv_r, rowu_X[2] * pv_r], axis=0),
            jnp.stack(
                [rowv_w[0] * dof[0], rowv_w[1] * dof[1], rowv_w[2] * dof[2],
                 zeros * dof[3], b1 * dof[4], b2 * dof[5],
                 rowv_X[0] * pv_r, rowv_X[1] * pv_r, rowv_X[2] * pv_r], axis=0),
        ],
        axis=0,
    )  # (2, 9, No) — observation-major, built in place

    # ---------------- depth ----------------
    Re_d = [_cam_expand_last(r, Nd) for r in R]
    te_d = [_cam_expand_last(t[:, k], Nd) for k in range(3)]
    Xd = xyz[data.d_pt]
    pxd = Re_d[0] * Xd[:, 0] + Re_d[1] * Xd[:, 1] + Re_d[2] * Xd[:, 2] + te_d[0]
    pyd = Re_d[3] * Xd[:, 0] + Re_d[4] * Xd[:, 1] + Re_d[5] * Xd[:, 2] + te_d[1]
    pzd = Re_d[6] * Xd[:, 0] + Re_d[7] * Xd[:, 1] + Re_d[8] * Xd[:, 2] + te_d[2]
    pzc = jnp.maximum(pzd, 1e-8)
    d_res = jnp.log(pzc) - data.d_logtarget
    s_d = d_res * d_res
    w_d = data.d_mag * losses.rho_prime(depth_loss, s_d, data.d_scale) * data.d_valid
    cost_d = (data.d_mag * losses.rho(depth_loss, s_d, data.d_scale) * data.d_valid).sum()

    inv_zd = jnp.where(pzd > 1e-8, 1.0 / pzc, 0.0)
    qxd = pxd - te_d[0]
    qyd = pyd - te_d[1]
    zerosd = jnp.zeros_like(pxd)
    # row a = (0,0,inv_zd) times -[q]_x: (izd*qy, -izd*qx, 0)
    dw = (inv_zd * qyd, -inv_zd * qxd, zerosd)
    dXd = (inv_zd * Re_d[6], inv_zd * Re_d[7], inv_zd * Re_d[8])
    dofd = [_cam_expand_last(data.cam_dof[:, k], Nd) for k in range(6)]
    pv_d = data.point_var[data.d_pt]
    J_d = jnp.stack(
        [dw[0] * dofd[0], dw[1] * dofd[1], dw[2] * dofd[2],
         zerosd * dofd[3], zerosd * dofd[4], inv_zd * dofd[5],
         dXd[0] * pv_d, dXd[1] * pv_d, dXd[2] * pv_d],
        axis=0,
    )  # (9, Nd)

    return {
        "J_r": J_r,
        "r_res": r_res,
        "w_r": w_r,
        "J_d": J_d,
        "d_res": d_res,
        "w_d": w_d,
        "cost": cost_r + cost_d,
    }


def _seg_reduce_last(vals, slots, mask):
    """Segment sum along the LAST axis (lane dim): vals (..., N),
    slots (S, K) -> (..., S). Gather + sum stay lane-aligned on TPU."""
    g = vals[..., slots]  # (..., S, K)
    return (g * mask).sum(axis=-1)


def _cam_reduce_last(vals, C):
    """Per-camera sum along the last axis for camera-major obs:
    (..., C*S) -> (..., C)."""
    return vals.reshape(*vals.shape[:-1], C, -1).sum(axis=-1)


def _cam_expand(x, No):
    """Broadcast per-camera values to camera-major obs rows WITHOUT a
    gather: x (C, ...) -> (No, ...). TPU dynamic gathers cost ~1.2ms per
    500k indices even from tiny tables; this reshape/broadcast is free."""
    C = x.shape[0]
    S = No // C
    return jnp.broadcast_to(x[:, None], (C, S, *x.shape[1:])).reshape(No, *x.shape[1:])


def _cam_expand_last(x, No):
    """x (..., C) -> (..., No) for camera-major obs rows (broadcast)."""
    C = x.shape[-1]
    S = No // C
    return jnp.broadcast_to(x[..., :, None], (*x.shape[:-1], C, S)).reshape(*x.shape[:-1], No)


def _assemble_ne(data: BAData, quat, t, xyz, reproj_loss: int, depth_loss: int):
    """Fused assembly + normal equations, TPU-layout-aware.

    Elementwise math runs on (No,) lane-aligned component vectors
    (small-minor-dim tensors waste VPU lanes). Reductions then switch to
    row-major tables so every gather indexes the MAJOR axis with
    contiguous rows — `vals[..., slots]` lane-dim indexing was measured
    at ~55 ms/iter on v5e vs <2 ms for the row-gather form:

      * per-camera sums: camera-major layout => reshape-sum, no gather;
      * per-point sums: the 9 point-side products (6 sym Hpp + 3 g_p)
        are stacked into one (No, 9) row table, gathered by the (P, K)
        slot table, and mask-summed over K;
      * dense-Schur coupling T[p,c]: one (P, C) row gather of the
        (No, 18) W table via `pc_*_slot` (a point is observed at most
        once per camera) — replaces the (P,K,C) one-hot contraction.

    Returns (Hcc (C,6,6), Hpp (P,3,3), g_c (C,6), g_p (P,3),
    Wr_rows (No,18), Wd_rows (Nd,18), T (P,C,6,3) or None).
    """
    quat = quat_normalize(quat)
    C = quat.shape[0]
    P = xyz.shape[0]
    No = data.r_cam.shape[0]
    Nd = data.d_cam.shape[0]
    R = _rotmat_cols(quat)

    # ---------------- reprojection side ----------------
    Re = [_cam_expand_last(r, No) for r in R]
    te = [_cam_expand_last(t[:, k], No) for k in range(3)]
    X = xyz[data.r_pt]
    X0, X1, X2 = X[:, 0], X[:, 1], X[:, 2]
    px = Re[0] * X0 + Re[1] * X1 + Re[2] * X2 + te[0]
    py = Re[3] * X0 + Re[4] * X1 + Re[5] * X2 + te[1]
    pz = Re[6] * X0 + Re[7] * X1 + Re[8] * X2 + te[2]
    fxe = _cam_expand_last(data.fx, No)
    fye = _cam_expand_last(data.fy, No)
    pzs = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    inv_z = 1.0 / pzs
    ru = fxe * px * inv_z + _cam_expand_last(data.cx, No) - data.r_uv[:, 0]
    rv = fye * py * inv_z + _cam_expand_last(data.cy, No) - data.r_uv[:, 1]
    s_r = ru * ru + rv * rv
    w_r = data.r_mag * losses.rho_prime(reproj_loss, s_r, data.r_scale) * data.r_valid

    a0 = fxe * inv_z
    a2 = -fxe * px * inv_z * inv_z
    b1 = fye * inv_z
    b2 = -fye * py * inv_z * inv_z
    qx = px - te[0]
    qy = py - te[1]
    qz = pz - te[2]
    zeros = jnp.zeros_like(px)
    dof = [_cam_expand_last(data.cam_dof[:, k], No) for k in range(6)]
    pv_r = data.point_var[data.r_pt]
    # camera-side rows (u and v residuals), dof-masked
    ju = [
        (a2 * qy) * dof[0], (a0 * qz - a2 * qx) * dof[1], (-a0 * qy) * dof[2],
        a0 * dof[3], zeros, a2 * dof[5],
    ]
    jv = [
        (b2 * qy - b1 * qz) * dof[0], (-b2 * qx) * dof[1], (b1 * qx) * dof[2],
        zeros, b1 * dof[4], b2 * dof[5],
    ]
    # point-side rows (row of dr/dp times R), point_var-masked
    jpu = [
        (a0 * Re[0] + a2 * Re[6]) * pv_r,
        (a0 * Re[1] + a2 * Re[7]) * pv_r,
        (a0 * Re[2] + a2 * Re[8]) * pv_r,
    ]
    jpv = [
        (b1 * Re[3] + b2 * Re[6]) * pv_r,
        (b1 * Re[4] + b2 * Re[7]) * pv_r,
        (b1 * Re[5] + b2 * Re[8]) * pv_r,
    ]

    # ---------------- depth side ----------------
    Re_d = [_cam_expand_last(r, Nd) for r in R]
    te_d = [_cam_expand_last(t[:, k], Nd) for k in range(3)]
    Xd = xyz[data.d_pt]
    pxd = Re_d[0] * Xd[:, 0] + Re_d[1] * Xd[:, 1] + Re_d[2] * Xd[:, 2] + te_d[0]
    pyd = Re_d[3] * Xd[:, 0] + Re_d[4] * Xd[:, 1] + Re_d[5] * Xd[:, 2] + te_d[1]
    pzd = Re_d[6] * Xd[:, 0] + Re_d[7] * Xd[:, 1] + Re_d[8] * Xd[:, 2] + te_d[2]
    pzc = jnp.maximum(pzd, 1e-8)
    d_res = jnp.log(pzc) - data.d_logtarget
    s_d = d_res * d_res
    w_d = data.d_mag * losses.rho_prime(depth_loss, s_d, data.d_scale) * data.d_valid
    inv_zd = jnp.where(pzd > 1e-8, 1.0 / pzc, 0.0)
    zerosd = jnp.zeros_like(pxd)
    dofd = [_cam_expand_last(data.cam_dof[:, k], Nd) for k in range(6)]
    pv_d = data.point_var[data.d_pt]
    jd = [
        (inv_zd * (pyd - te_d[1])) * dofd[0], (-inv_zd * (pxd - te_d[0])) * dofd[1], zerosd,
        zerosd, zerosd, inv_zd * dofd[5],
    ]
    jpd = [inv_zd * Re_d[6] * pv_d, inv_zd * Re_d[7] * pv_d, inv_zd * Re_d[8] * pv_d]

    # ---------------- camera-side reductions (reshape sums) ----------------
    hcc = {}
    for i in range(6):
        for j in range(i, 6):
            e = _cam_reduce_last(w_r * (ju[i] * ju[j] + jv[i] * jv[j]), C)
            e = e + _cam_reduce_last(w_d * (jd[i] * jd[j]), C)
            hcc[(i, j)] = e
    Hcc = jnp.stack(
        [jnp.stack([hcc[(min(i, j), max(i, j))] for j in range(6)], -1) for i in range(6)], -2
    )  # (C,6,6)
    g_c = jnp.stack(
        [
            _cam_reduce_last(w_r * (ju[i] * ru + jv[i] * rv), C)
            + _cam_reduce_last(w_d * (jd[i] * d_res), C)
            for i in range(6)
        ],
        -1,
    )  # (C,6)

    # ---------------- point-side row tables + slot gathers ----------------
    def point_rows(wu_, wv_, pu, pv, resu, resv):
        # [pp00,pp01,pp02,pp11,pp12,pp22, gp0,gp1,gp2]
        cols = [wu_ * (pu[i] * pu[j]) + wv_ * (pv[i] * pv[j]) for i in range(3) for j in range(i, 3)]
        cols += [wu_ * (pu[i] * resu) + wv_ * (pv[i] * resv) for i in range(3)]
        return jnp.stack(cols, axis=-1)  # (N, 9)

    prow_r = point_rows(w_r, w_r, jpu, jpv, ru, rv)
    prow_d = point_rows(w_d, jnp.zeros_like(w_d), jpd, jpd, d_res, d_res)
    pr = (prow_r[data.r_pt_slots] * data.r_pt_slot_mask[..., None]).sum(1)
    pr = pr + (prow_d[data.d_pt_slots] * data.d_pt_slot_mask[..., None]).sum(1)  # (P,9)
    s00, s01, s02, s11, s12, s22 = (pr[:, k] for k in range(6))
    Hpp = jnp.stack(
        [
            jnp.stack([s00, s01, s02], -1),
            jnp.stack([s01, s11, s12], -1),
            jnp.stack([s02, s12, s22], -1),
        ],
        -2,
    )  # (P,3,3)
    g_p = pr[:, 6:9]

    # ---------------- W coupling row tables ----------------
    Wr_rows = jnp.stack(
        [w_r * (ju[i] * jpu[j] + jv[i] * jpv[j]) for i in range(6) for j in range(3)], axis=-1
    )  # (No,18)
    Wd_rows = jnp.stack([w_d * (jd[i] * jpd[j]) for i in range(6) for j in range(3)], axis=-1)

    T = None
    if data.pc_r_slot is not None:
        T = Wr_rows[data.pc_r_slot] * data.pc_r_mask[..., None]
        T = T + Wd_rows[data.pc_d_slot] * data.pc_d_mask[..., None]
        T = T.reshape(P, C, 6, 3)
    return Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, T


def _cam_broadcast_rows(x, N):
    """x (C, k) -> (N, k) camera-major row broadcast (no gather)."""
    C = x.shape[0]
    return jnp.broadcast_to(x[:, None, :], (C, N // C, x.shape[1])).reshape(N, x.shape[1])


def _schur_pcg(data: BAData, Hcc_aug, Hpp_inv, Wr_rows, Wd_rows, rhs, cg_iters: int, cg_tol,
               x0=None):
    """PCG on S x = rhs with S = Hcc_aug − W Hpp_inv Wᵀ, matrix-free.
    x0: optional warm start (the previous LM iteration's camera step —
    successive reduced systems differ only by the state update and λ, so
    the previous solution removes most of the initial residual)."""
    C = Hcc_aug.shape[0]
    No, Nd = Wr_rows.shape[0], Wd_rows.shape[0]
    Wr = Wr_rows.reshape(No, 6, 3)
    Wd = Wd_rows.reshape(Nd, 6, 3)
    Minv = jnp.linalg.inv(Hcc_aug)  # block-Jacobi preconditioner (C,6,6)

    def S_mv(x):  # x (C,6)
        y_r = (Wr * _cam_broadcast_rows(x, No)[:, :, None]).sum(1)  # (No,3)
        y_d = (Wd * _cam_broadcast_rows(x, Nd)[:, :, None]).sum(1)
        yp = (y_r[data.r_pt_slots] * data.r_pt_slot_mask[..., None]).sum(1)
        yp = yp + (y_d[data.d_pt_slots] * data.d_pt_slot_mask[..., None]).sum(1)  # (P,3)
        zp = jnp.einsum("pij,pj->pi", Hpp_inv, yp)  # (P,3)
        back_r = (Wr * zp[data.r_pt][:, None, :]).sum(-1)  # (No,6)
        back_d = (Wd * zp[data.d_pt][:, None, :]).sum(-1)
        back = back_r.reshape(C, -1, 6).sum(1) + back_d.reshape(C, -1, 6).sum(1)
        return jnp.einsum("cij,cj->ci", Hcc_aug, x) - back

    def prec(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    x0 = jnp.zeros_like(rhs) if x0 is None else x0
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


def _dense_schur_solve(T, Hcc_aug, Hpp_inv, rhs):
    """Form S = Hcc − W Hpp⁻¹ Wᵀ densely (6C x 6C) and Cholesky-solve.

    TPU rationale: the PCG matvec needs one ~1.2ms dynamic gather per
    iteration (the hard floor of TPU gathers), so 100 CG iterations cost
    ~120ms. With the precomputed coupling T (P,C,6,3), the reduction is
    one batched (C6,3)x(3,3) matmul + one MXU (C6, 3P)x(3P, C6)
    dot_general + one small Cholesky — ~2ms for C up to several hundred
    (the per-shard dense reduced system of SURVEY.md §7.1).
    """
    C = Hcc_aug.shape[0]
    P = Hpp_inv.shape[0]
    dtype = Hcc_aug.dtype

    U = T.reshape(P, C * 6, 3)
    TB = jnp.einsum("pkl,plm->pkm", U, Hpp_inv)  # (P, 6C, 3)
    # S_red[k,m] = sum_{p,l} TB[p,k,l] U[p,m,l] — one MXU contraction.
    S_red = jax.lax.dot_general(
        TB, U, dimension_numbers=(((0, 2), (0, 2)), ((), ())), preferred_element_type=dtype
    )
    Hcc_full = jnp.zeros((C, 6, C, 6), dtype)
    ii = jnp.arange(C)
    Hcc_full = Hcc_full.at[ii, :, ii, :].set(Hcc_aug).reshape(6 * C, 6 * C)
    S = Hcc_full - S_red
    chol = jax.scipy.linalg.cho_factor(S + 1e-7 * jnp.eye(6 * C, dtype=dtype))
    x = jax.scipy.linalg.cho_solve(chol, rhs.reshape(6 * C))
    return x.reshape(C, 6), jnp.asarray(0, jnp.int32)


@partial(jax.jit, static_argnames=("reproj_loss", "depth_loss", "max_iters", "cg_iters", "dense_schur_max_cams"))
def solve_ba(
    data: BAData,
    reproj_loss: int = losses.SOFT_L1,
    depth_loss: int = losses.CAUCHY,
    max_iters: int = 20,
    # CG budget 32 (was 100): at 512 cams the preconditioned residual
    # stalls mid-solve and CG just burns its cap in ~5ms gather
    # iterations; capping at 32 gives the SAME final cost with MORE
    # accepted LM steps (inexact steps are gated by the accept test) and
    # 1.62 -> 3.52 LM iters/s on the 512-cam/131k-pt bench (PERF.md r3).
    cg_iters: int = 32,
    # inexact-Newton forcing ceiling: the LM accept test gates step quality,
    # so early Schur solves only need ~2 digits of relative residual — on
    # the slot-table path every extra CG iteration is 2 dynamic gathers over
    # all observation rows (the dominant cost at 500+ cameras). The
    # EFFECTIVE tolerance tightens as the gradient shrinks
    # (Eisenstat–Walker-style min(cg_tol, sqrt(‖rhs‖/‖rhs0‖)), floored at
    # 1e-4 — the LM accept test gates step quality; tighter inner solves
    # at 500+ cameras only buy more ~5ms gather iterations) so late
    # iterations tighten as the gradient shrinks.
    cg_tol: float = 1e-2,
    lm_lambda0: float = 1e-4,
    rel_tol: float = 1e-6,
    dense_schur_max_cams: int = 512,
):
    """Run LM. Returns (quat, t, xyz, info dict)."""
    C = data.quat.shape[0]
    P = data.xyz.shape[0]
    dtype = data.xyz.dtype

    def cost_of(quat, t, xyz):
        return _cost_only(data, quat, t, xyz, reproj_loss, depth_loss)

    def ne_of(quat, t, xyz):
        return _assemble_ne(data, quat, t, xyz, reproj_loss, depth_loss)

    # trace-time path choice: explicit block-sparse Schur for the large
    # path (ba/schur_sparse.py) — dense-pc path takes precedence
    use_bs = data.bs is not None and not (
        data.pc_r_slot is not None and C <= dense_schur_max_cams
    )

    def hpp_inv_of(Hpp, lam):
        eye3 = jnp.eye(3, dtype=dtype)
        frozen_p = 1.0 - data.point_var
        dp = jnp.einsum("pii->pi", Hpp)
        return inv3x3(
            Hpp
            + jnp.einsum(
                "pi,ij->pij",
                lam * dp + 1e-8 + frozen_p[:, None] * jnp.ones(3, dtype),
                eye3,
            )
            * eye3
        )

    def bs_tables_of(ne, lam):
        """(Vpm, G) at the given NE/λ — rebuilt only on accepted steps;
        rejected steps reuse G with the stale λ in its point damping
        (steps remain LM accept-gated, so a slightly-off S only costs
        acceptance rate, never correctness)."""
        _Hcc, Hpp, _g_c, _g_p, Wr_rows, Wd_rows, _T = ne
        Vpm = pm_coupling_table(Wr_rows, Wd_rows, data.bs)
        G = build_schur_blocks(Vpm, hpp_inv_of(Hpp, lam), data.bs)
        return Vpm, G

    def step(carry):
        (it, quat, t, xyz, lam, cost, done, accepted, ne, rhs0_norm, hist, cg_hist,
         delta_prev, bs_cache) = carry
        # ne holds the normal-equation products at the CURRENT state; they
        # are lambda-independent, so rejected steps reuse them and only the
        # (cheap) augmented solve + residual-only trial cost re-runs.
        Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, T = ne
        No, Nd = Wr_rows.shape[0], Wd_rows.shape[0]
        Wr = Wr_rows.reshape(No, 6, 3)
        Wd = Wd_rows.reshape(Nd, 6, 3)

        # LM augmentation (Marquardt scaling) + identity rows for frozen dims.
        dc = jnp.einsum("cii->ci", Hcc)
        eye6 = jnp.eye(6, dtype=dtype)
        frozen_c = 1.0 - data.cam_dof  # (C,6)
        Hcc_aug = Hcc + jnp.einsum("ci,ij->cij", lam * dc + 1e-8 + frozen_c, eye6) * eye6
        Hpp_inv = hpp_inv_of(Hpp, lam)

        # Explicit block-sparse S path (ba/schur_sparse.py): the
        # covisibility blocks G and the pm coupling table live in the
        # loop carry and are rebuilt only on accepted steps; CG runs on
        # the tiny explicit structure (µs/iteration instead of two
        # all-observation gathers). rhs + back-substitution run in the
        # SAME point-major layout so the W tables have one consumer
        # access pattern (layout conflicts were measured to 2.5x the
        # iteration cost).
        if use_bs:
            Vpm, G = bs_cache
            rhs, hp = pm_reduced_rhs(Vpm, Hpp_inv, g_c, g_p, data.bs)
        else:
            # Reduced RHS: -(g_c − W Hpp⁻¹ g_p)
            hp = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)  # (P,3)
            red_r = (Wr * hp[data.r_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
            red_d = (Wd * hp[data.d_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
            rhs = -(g_c - red_r - red_d)

        # Dense reduced system when the pc-slot coupling table exists and
        # the 6Cx6C system is small; matrix-free PCG otherwise. Shapes are
        # static, so this branch is resolved at trace time.
        rhs_norm = jnp.sqrt((rhs * rhs).sum())
        rhs0_norm = jnp.where(rhs0_norm < 0, rhs_norm, rhs0_norm)
        if T is not None and C <= dense_schur_max_cams:
            delta_c, cg_used = _dense_schur_solve(T, Hcc_aug, Hpp_inv, rhs)
        elif use_bs:
            tol_eff = jnp.clip(
                jnp.sqrt(rhs_norm / jnp.maximum(rhs0_norm, 1e-30)), 1e-4, cg_tol
            )
            # explicit-block CG iterations are ~µs — let it run further
            # than the gather-bound matrix-free budget
            delta_c, cg_used = schur_cg_blocks(
                G, data.bs, Hcc_aug, rhs, max(cg_iters, 64), tol_eff, x0=delta_prev
            )
        else:
            tol_eff = jnp.clip(
                jnp.sqrt(rhs_norm / jnp.maximum(rhs0_norm, 1e-30)), 1e-4, cg_tol
            )
            delta_c, cg_used = _schur_pcg(
                data, Hcc_aug, Hpp_inv, Wr_rows, Wd_rows, rhs, cg_iters, tol_eff,
                x0=delta_prev,
            )
        delta_c = delta_c * data.cam_dof

        # Back-substitution: Δp = −Hpp⁻¹ (g_p + Wᵀ Δc)
        if use_bs:
            delta_p = pm_backsub(Vpm, Hpp_inv, g_p, delta_c, data.point_var, data.bs)
        else:
            wtd_r = (Wr * _cam_broadcast_rows(delta_c, No)[:, :, None]).sum(1)  # (No,3)
            wtd_d = (Wd * _cam_broadcast_rows(delta_c, Nd)[:, :, None]).sum(1)
            wtd = (wtd_r[data.r_pt_slots] * data.r_pt_slot_mask[..., None]).sum(1)
            wtd = wtd + (wtd_d[data.d_pt_slots] * data.d_pt_slot_mask[..., None]).sum(1)  # (P,3)
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
        ne = jax.lax.cond(take, lambda: ne_of(quat, t, xyz), lambda: ne)
        if use_bs:
            bs_cache = jax.lax.cond(
                take, lambda: bs_tables_of(ne, lam), lambda: bs_cache
            )
        hist = hist.at[it].set(cost)
        cg_hist = cg_hist.at[it].set(cg_used)
        return (it + 1, quat, t, xyz, lam, cost, done, accepted, ne, rhs0_norm, hist,
                cg_hist, delta_c, bs_cache)

    cost0 = cost_of(data.quat, data.t, data.xyz)
    ne0 = ne_of(data.quat, data.t, data.xyz)
    bs_cache0 = (
        bs_tables_of(ne0, jnp.asarray(lm_lambda0, dtype)) if use_bs else jnp.zeros((), dtype)
    )
    init = (
        jnp.asarray(0, jnp.int32),
        data.quat,
        data.t,
        data.xyz,
        jnp.asarray(lm_lambda0, dtype),
        cost0,
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        ne0,
        jnp.asarray(-1.0, dtype),
        jnp.full((max_iters,), cost0, dtype),
        jnp.zeros((max_iters,), jnp.int32),
        jnp.zeros((C, 6), dtype),
        bs_cache0,
    )
    # while_loop (not scan): converged solves exit early instead of paying
    # the remaining iterations' trial-cost evaluations.
    (_it, quat, t, xyz, lam, cost, done, accepted, _ne, _r0, cost_hist, cg_hist,
     _dp, _bs) = jax.lax.while_loop(
        lambda c: (c[0] < max_iters) & ~c[6], step, init
    )
    info = {
        "cost0": cost0,
        "cost": cost,
        "accepted": accepted,
        "cost_history": cost_hist,
        "cg_iters": cg_hist,
    }
    return quat, t, xyz, info
