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


def _dlt_normalize(xyz, mask):
    """Centroid/scale world normalization for DLT conditioning."""
    w = mask.astype(xyz.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    c = (xyz * w[:, None]).sum(0) / n
    d = jnp.sqrt(((xyz - c) ** 2).sum(-1)) * w
    s = jnp.sqrt(3.0) / jnp.maximum(d.sum() / n, 1e-12)
    return (xyz - c) * s, c, s


def _dlt_system(Xn, xy_norm):
    X, Y, Z = Xn[:, 0], Xn[:, 1], Xn[:, 2]
    u, v = xy_norm[:, 0], xy_norm[:, 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    rows_a = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], axis=-1)
    rows_b = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], axis=-1)
    # interleaved per-point row pairs: keeps the leading n-1 rows spanning
    # the row space (required by the QR-complete nullspace path)
    return jnp.stack([rows_a, rows_b], axis=1).reshape(-1, 12)


def _pose_from_P(P, Xn, mask, c, s):
    """[R|t] up to scale (in the NORMALIZED world frame) -> Rigid3d
    cam_from_world in the original frame: sign fix, SO(3) projection,
    scale recovery, un-normalization."""
    depths = jnp.einsum("j,nj->n", P[2, :3], Xn) + P[2, 3]
    sign = jnp.where((jnp.where(mask, depths, 0.0)).sum() < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]
    U, sv, Vt = svd3x3(M)
    sign = jnp.where(jnp.linalg.det(U @ Vt) < 0, -1.0, 1.0)
    R = U @ Vt * sign
    sigma = sv.mean() * sign
    sigma = jnp.where(jnp.abs(sigma) < 1e-12, 1e-12, sigma)
    t = P[:, 3] / sigma
    # Undo world normalization: x_cam = R (s (X - c)) + t = (sR) X + (t - s R c)
    t_w = t / s - R @ c
    return Rigid3d(matrix_to_quat(R), t_w)


def pnp_from_six_points(xyz, xy_norm, mask=None, minimal: bool = False):
    """DLT-PnP: world points (N,3), normalized image coords (N,2), N>=6.

    Solves for P = [R|t] up to scale via the nullspace of the 2Nx12 DLT
    system (QR path when minimal), then projects R onto SO(3) and rescales
    t. Returns Rigid3d cam_from_world. NOTE: degenerate for coplanar
    points (the DLT nullspace becomes 4-D) — RANSAC pairs it with
    `pnp_from_plane` hypotheses for possibly-planar scenes.
    """
    N = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((N,), dtype=bool)
    Xn, c, s = _dlt_normalize(xyz, mask)
    A = _dlt_system(Xn, xy_norm)
    if minimal:
        P = nullspace_vector_minimal(A).reshape(3, 4)
    else:
        m2 = jnp.stack([mask, mask], axis=1).reshape(-1).astype(A.dtype)
        P = nullspace_vector(A, m2).reshape(3, 4)
    return _pose_from_P(P, Xn, mask, c, s)


def pnp_from_plane(xyz, xy_norm):
    """Homography-based planar PnP (the classic coplanar-points solver).

    For coplanar world points the 6-pt DLT degenerates: any P + q·πᵀ
    (π the plane's homogeneous coords) satisfies the projective
    equations, so the 2Nx12 system has a 4-D nullspace and the plain
    smallest-vector solution is garbage — the failure mode that made the
    DLT RANSAC return ~0 inliers on integrated (near-exactly planar)
    lifted depth clouds while cv2's P3P found 148/156. The well-posed
    planar route: fit the points' plane, express them in an in-plane
    2-D frame, DLT the plane→image homography (8 dof, well-conditioned),
    and decompose H = λ[r1 r2 | t] with SO(3) projection. jit/vmap-safe.
    """
    dtype = xyz.dtype
    c = xyz.mean(0)
    Xc = xyz - c
    _, V = jnp.linalg.eigh(Xc.T @ Xc)  # ascending: V[:,0] = plane normal
    e2, e1 = V[:, 1], V[:, 2]
    # right-handed plane frame (eigh column signs are arbitrary; an
    # improper [e1;e2;n] would make R_cw a reflection)
    nrm = jnp.cross(e1, e2)
    uv = Xc @ jnp.stack([e1, e2], 1)  # (N,2) in-plane coordinates
    # condition the homography DLT
    s = jnp.sqrt(2.0) / jnp.maximum(jnp.sqrt((uv**2).sum(-1)).mean(), 1e-12)
    u, v = uv[:, 0] * s, uv[:, 1] * s
    x, y = xy_norm[:, 0], xy_norm[:, 1]
    o = jnp.ones_like(u)
    z = jnp.zeros_like(u)
    rows_a = jnp.stack([u, v, o, z, z, z, -x * u, -x * v, -x], axis=-1)
    rows_b = jnp.stack([z, z, z, u, v, o, -y * u, -y * v, -y], axis=-1)
    # INTERLEAVE the per-point row pairs: the QR-complete nullspace trick
    # needs the leading n-1 rows to span the row space, which fails if
    # all x-equations come before all y-equations
    A = jnp.stack([rows_a, rows_b], axis=1).reshape(-1, 9)
    h = nullspace_vector_minimal(A)
    Hn = h.reshape(3, 3)
    # undo the uv conditioning: H_raw maps RAW in-plane coords -> image
    H = Hn @ jnp.diag(jnp.array([s, s, 1.0], dtype))
    # cheirality: projective depths of the sample must be positive
    zi = H[2, 0] * uv[:, 0] + H[2, 1] * uv[:, 1] + H[2, 2]
    H = H * jnp.where(zi.sum() < 0, -1.0, 1.0)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 0.5 * (jnp.linalg.norm(h1) + jnp.linalg.norm(h2))
    lam = jnp.maximum(lam, 1e-12)
    r1, r2 = h1 / lam, h2 / lam
    M = jnp.stack([r1, r2, jnp.cross(r1, r2)], 1)
    U, _, Vt = svd3x3(M)
    sgn = jnp.where(jnp.linalg.det(U @ Vt) < 0, -1.0, 1.0)
    R_p = U @ (Vt * jnp.array([1.0, 1.0, sgn], dtype)[:, None])
    # x_cam = R_p [e1ᵀ; e2ᵀ; nᵀ](X - c) + h3/λ  ->  cam_from_world
    B = jnp.stack([e1, e2, nrm], 0)  # (3,3) world -> plane frame
    R_cw = R_p @ B
    t_cw = h3 / lam - R_cw @ c
    return Rigid3d(matrix_to_quat(R_cw), t_cw)


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
