"""Schur-based per-point 3x3 covariance estimation (JAX).

TPU-native replacement for pycolmap.estimate_ba_covariance with
params=POINTS (reference: mpsfm/sfm/mapper/bundle_adjustment.py:244-261).
With H = [[Hcc, W], [Wᵀ, Hpp]] from the (trivial-loss, 1/kp_std²-weighted)
reprojection system, the point block of H⁻¹ is

    cov_p = B_p⁻¹ + B_p⁻¹ T_pᵀ S⁻¹ T_p B_p⁻¹,

with B_p = Hpp_p (3x3), T_p the stacked cam-point coupling column of point
p, and S = Hcc − Σ_p T_p B_p⁻¹ T_pᵀ the reduced camera system. S is formed
densely (6C × 6C) in point chunks and solved once by Cholesky; the same
chunks then produce every point covariance batched. Gauge rank-deficiency
is removed exactly as in the BA (pose0 frozen, pose1 tx frozen).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpsfm_tpu.ba.solver import (
    BAData,
    _assemble,
    _cam_reduce_last,
    _seg_reduce_last,
    inv3x3,
)
from mpsfm_tpu.ba import losses


@partial(jax.jit, static_argnames=())
def point_covariances(data: BAData):
    """Returns (P,3,3) covariances for all (padded) points.

    Reductions are gather-only (TPU scatter-add is serialized): Hcc via
    camera-major reshape-sums, Hpp via the point slot tables, and T via
    the per-(point,camera) slot table when present — the same layout
    tricks as solver._assemble_ne."""
    C = data.quat.shape[0]
    P = data.xyz.shape[0]
    dtype = data.xyz.dtype

    asm = _assemble(data, data.quat, data.t, data.xyz, losses.TRIVIAL, losses.TRIVIAL)
    J_r, w_r = asm["J_r"], asm["w_r"]  # J_r (2,9,No) observation-major
    Jc, Jp = J_r[:, :6], J_r[:, 6:]

    # Hcc (C,6,6): camera-major lane reduce — obs rows [c*S,(c+1)*S) per cam
    hcc_rows = jnp.einsum("rin,rjn->ijn", Jc * w_r, Jc)  # (6,6,No)
    Hcc_blocks = _cam_reduce_last(hcc_rows, C).transpose(2, 0, 1)  # (C,6,6)
    # Hpp (P,3,3): slot-table gather reduce
    prow = jnp.einsum("rin,rjn->ijn", Jp * w_r, Jp)  # (3,3,No)
    Hpp = _seg_reduce_last(prow, data.r_pt_slots, data.r_pt_slot_mask).transpose(2, 0, 1)
    W_rows = jnp.einsum("rin,rjn->nij", Jc * w_r, Jp)  # (No,6,3)

    frozen = 1.0 - data.cam_dof
    eye6 = jnp.eye(6, dtype=dtype)
    Hcc_blocks = Hcc_blocks + jnp.einsum("ci,ij->cij", frozen + 1e-6, eye6) * eye6
    Binv = inv3x3(
        Hpp
        + jnp.einsum(
            "pi,ij->pij", (1.0 - data.point_var)[:, None] * jnp.ones(3, dtype) + 1e-6, jnp.eye(3, dtype=dtype)
        )
        * jnp.eye(3, dtype=dtype)
    )

    # T (P, 6C, 3): per-point stacked coupling columns.
    if data.pc_r_slot is not None:
        T = (W_rows.reshape(-1, 18)[data.pc_r_slot] * data.pc_r_mask[..., None]).reshape(
            P, C * 6, 3
        )
    else:
        No = W_rows.shape[0]
        flat_rows = (data.r_cam[:, None] * 6 + jnp.arange(6)[None, :]).reshape(-1)  # (No*6,)
        flat_pt = jnp.repeat(data.r_pt, 6)
        Wflat = W_rows.reshape(No * 6, 3)
        T = jnp.zeros((P, 6 * C, 3), dtype).at[flat_pt, flat_rows].add(Wflat)

    Hcc = jnp.zeros((6 * C, 6 * C), dtype)
    ii = jnp.arange(C)
    Hcc = Hcc.reshape(C, 6, C, 6).at[ii, :, ii, :].set(Hcc_blocks).reshape(6 * C, 6 * C)
    TB = jnp.einsum("pkj,pjl->pkl", T, Binv)  # (P,6C,3)
    S_red = jax.lax.dot_general(
        TB, T, (((0, 2), (0, 2)), ((), ())), preferred_element_type=dtype
    )  # (6C,6C), one MXU contraction
    S = Hcc - S_red

    # Solve S X = T_p B_p⁻¹ for all points at once.
    chol = jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(6 * C, dtype=dtype))
    rhs = TB.transpose(1, 0, 2).reshape(6 * C, P * 3)
    X = jax.scipy.linalg.cho_solve(chol, rhs).reshape(6 * C, P, 3).transpose(1, 0, 2)
    cov = Binv + jnp.einsum("pkl,pkm->plm", TB, X)
    return cov


def calculate_point_covs(rec, problem, max_cams_dense: int = 512):
    """Host wrapper: computes covs for a BAProblem and stores them into
    rec.point_covs (reference bundle_adjustment.py:260-261)."""
    import numpy as np

    if problem.n_cams > max_cams_dense:
        raise ValueError(f"dense covariance limited to {max_cams_dense} cams")
    cov_dev = point_covariances(problem.data)  # async dispatch
    pend = getattr(rec.point_covs, "set_pending", None)
    if pend is not None:
        # defer the device->host read to the first access (LazyCovDict)
        pend(cov_dev, [int(p) for p in problem.pt_ids])
        return cov_dev
    cov = np.asarray(cov_dev, np.float64)
    for i, pid in enumerate(problem.pt_ids):
        rec.point_covs[int(pid)] = cov[i]
    return cov
