"""Batched triangulation and angle/cheirality checks (JAX).

Replaces pycolmap.estimate_triangulation and COLMAP's angle helpers used
by the reference (mpsfm/utils/geometry.py:56-75,
mpsfm/sfm/mapper/registration.py:38-66) with fixed-shape batched kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpsfm_tpu.geometry.projection import Camera, cam_from_img
from mpsfm_tpu.geometry.rotations import Rigid3d, quat_to_matrix, projection_center


def _pose_matrix(pose: Rigid3d):
    """(...,3,4) projection matrix [R|t] in normalized camera coords."""
    R = quat_to_matrix(pose.quat)
    return jnp.concatenate([R, pose.t[..., :, None]], axis=-1)


def triangulate_two_view(pose1: Rigid3d, pose2: Rigid3d, xy1_norm, xy2_norm):
    """DLT triangulation of normalized image points. Batched over leading dims.

    Returns world xyz (...,3). Uses the homogeneous DLT with a closed-form
    4x4 symmetric eigen-solve via SVD on the stacked constraint matrix.
    """
    P1 = _pose_matrix(pose1)
    P2 = _pose_matrix(pose2)
    rows = jnp.stack(
        [
            xy1_norm[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            xy1_norm[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            xy2_norm[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            xy2_norm[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # (...,4,4)
    # Smallest right singular vector of rows, via eigh of rowsᵀ rows
    # (see geometry/linalg.py for the TPU compile-time rationale).
    from mpsfm_tpu.geometry.linalg import nullspace_vector

    X = nullspace_vector(rows)
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12 * jnp.where(w < 0, -1.0, 1.0), w)
    return X[..., :3] / w[..., None]


def triangulate_two_view_px(pose1, pose2, cam1: Camera, cam2: Camera, xy1, xy2):
    return triangulate_two_view(pose1, pose2, cam_from_img(cam1, xy1), cam_from_img(cam2, xy2))


def triangulate_nview(poses_mat, xy_norm, mask):
    """N-view DLT: poses_mat (N,3,4), xy_norm (N,2), mask (N,) validity.

    Solves sum_i m_i * A_iᵀA_i eigenproblem. Returns (xyz, ok). Batched via vmap.
    """
    a0 = xy_norm[..., 0, None] * poses_mat[..., 2, :] - poses_mat[..., 0, :]
    a1 = xy_norm[..., 1, None] * poses_mat[..., 2, :] - poses_mat[..., 1, :]
    A = jnp.concatenate([a0, a1], axis=-2) if a0.ndim > 2 else jnp.stack([a0, a1], axis=-2).reshape(-1, 4)
    m = jnp.repeat(mask.astype(A.dtype), 2, axis=-1)
    AtA = (A * m[..., None]).swapaxes(-1, -2) @ A
    # smallest eigenvector of symmetric 4x4
    w, v = jnp.linalg.eigh(AtA)
    X = v[..., :, 0]
    wh = X[..., 3]
    wh = jnp.where(jnp.abs(wh) < 1e-12, 1e-12, wh)
    ok = mask.sum(-1) >= 2
    return X[..., :3] / wh[..., None], ok


def triangulation_angle(center1, center2, xyz):
    """Angle (radians) between rays from two camera centers to xyz.

    Matches the reference's calculate_triangulation_angle
    (mpsfm/utils/geometry.py:56-70), including its use of *norms* (not
    squared norms) in the law-of-cosines expression — kept for parity.
    """
    baseline = jnp.linalg.norm(center1 - center2, axis=-1)
    r1 = jnp.linalg.norm(xyz - center1, axis=-1)
    r2 = jnp.linalg.norm(xyz - center2, axis=-1)
    denom = 2.0 * jnp.sqrt(r1 * r2)
    nom = r1 + r2 - baseline
    cosang = jnp.where(denom > 0, nom / jnp.maximum(denom, 1e-12), 1.0)
    ang = jnp.abs(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    return jnp.minimum(ang, jnp.pi - ang)


def pair_triangulation_angle(pose1: Rigid3d, pose2: Rigid3d, xyz):
    return triangulation_angle(projection_center(pose1), projection_center(pose2), xyz)


def point_depth(pose: Rigid3d, xyz):
    """Depth of world points in the camera frame (third row of [R|t] @ X)."""
    R = quat_to_matrix(pose.quat)
    return jnp.einsum("...j,...j->...", R[..., 2, :], xyz) + pose.t[..., 2]


def has_positive_depth(pose: Rigid3d, xyz, eps=2.2e-16):
    return point_depth(pose, xyz) >= eps
