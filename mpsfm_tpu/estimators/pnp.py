"""Batched absolute-pose (PnP) estimation primitives (JAX).

TPU-native replacement for pycolmap.estimate_and_refine_absolute_pose
(reference: mpsfm/sfm/estimators/absolute_pose.py). Hypotheses come from a
6-point DLT-PnP with SO(3) projection; refinement is a fixed-iteration
Gauss-Newton on the SE(3) tangent space over (masked) inliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpsfm_tpu.geometry.linalg import nullspace_vector, nullspace_vector_minimal, svd3x3
from mpsfm_tpu.geometry.rotations import (
    Rigid3d,
    apply_local_update,
    matrix_to_quat,
    quat_rotate,
)


def pnp_from_six_points(xyz, xy_norm, mask=None, minimal: bool = False):
    """DLT-PnP: world points (N,3), normalized image coords (N,2), N>=6.

    Solves for P = [R|t] up to scale via the nullspace of the 2Nx12 DLT
    system (QR path when minimal), then projects R onto SO(3) and rescales
    t. Returns Rigid3d cam_from_world.
    """
    N = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((N,), dtype=bool)
    # Normalize world points (centroid/scale) for conditioning.
    w = mask.astype(xyz.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    c = (xyz * w[:, None]).sum(0) / n
    d = jnp.sqrt(((xyz - c) ** 2).sum(-1)) * w
    s = jnp.sqrt(3.0) / jnp.maximum(d.sum() / n, 1e-12)
    Xn = (xyz - c) * s

    X, Y, Z = Xn[:, 0], Xn[:, 1], Xn[:, 2]
    u, v = xy_norm[:, 0], xy_norm[:, 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    rows_a = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], axis=-1)
    rows_b = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)
    if minimal:
        P = nullspace_vector_minimal(A).reshape(3, 4)
    else:
        m2 = jnp.concatenate([mask, mask]).astype(A.dtype)
        P = nullspace_vector(A, m2).reshape(3, 4)
    # Fix sign: points should be in front of the camera (positive depth).
    depths = jnp.einsum("j,nj->n", P[2, :3], Xn) + P[2, 3]
    sign = jnp.where((jnp.where(mask, depths, 0.0)).sum() < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]
    # Project M onto scaled rotations: M = sigma * R with R in SO(3).
    U, sv, Vt = svd3x3(M)
    sign = jnp.where(jnp.linalg.det(U @ Vt) < 0, -1.0, 1.0)
    R = U @ Vt * sign
    sigma = sv.mean() * sign
    sigma = jnp.where(jnp.abs(sigma) < 1e-12, 1e-12, sigma)
    t = P[:, 3] / sigma
    # Undo world normalization: x_cam = R (s (X - c)) + t = (sR) X + (t - s R c)
    # We need cam_from_world for unnormalized X: R_w = R, t_w = t/s_eff...
    # With Xn = s (X - c): x_cam/sigma' ~ R Xn + t  ->  R X * s + (t - s R c)
    # Scale: projective depth scale-invariant in DLT, recover via s:
    t_w = t / s - R @ c
    return Rigid3d(matrix_to_quat(R), t_w)


def reprojection_residuals(pose: Rigid3d, xyz, xy_norm):
    """Residuals in normalized image plane. Returns (N,2)."""
    p_cam = quat_rotate(pose.quat, xyz) + pose.t
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = p_cam[..., :2] / zs[..., None]
    return proj - xy_norm


def refine_pose_gn(pose: Rigid3d, xyz, xy_norm, weights, iters: int = 10, damping: float = 1e-6):
    """Fixed-iteration damped Gauss-Newton pose refinement on SE(3).

    weights (N,): 0/1 inlier mask or robust weights. jit/vmap-safe.
    """

    def resid_flat(params, pose):
        omega, dt = params[:3], params[3:]
        p = apply_local_update(pose, omega, dt)
        return reprojection_residuals(p, xyz, xy_norm).reshape(-1)

    wfull = jnp.repeat(weights, 2)

    def body(_, pose):
        zero = jnp.zeros(6, dtype=pose.t.dtype)
        J = jax.jacfwd(resid_flat)(zero, pose)  # (2N, 6)
        r = resid_flat(zero, pose)
        Jw = J * wfull[:, None]
        H = Jw.T @ J + damping * jnp.eye(6, dtype=J.dtype)
        g = Jw.T @ r
        delta = -jnp.linalg.solve(H, g)
        ok = jnp.isfinite(delta).all()
        delta = jnp.where(ok, delta, 0.0)
        return apply_local_update(pose, delta[:3], delta[3:])

    return jax.lax.fori_loop(0, iters, body, pose)
