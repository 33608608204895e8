"""Batched essential-matrix estimation primitives (JAX).

TPU-native replacement for pycolmap.essential_matrix_estimation used by
the reference's RelativePose estimator (mpsfm/sfm/estimators/relative_pose.py).
Hypotheses come from the normalized 8-point algorithm projected onto the
essential manifold; scoring uses squared Sampson error in normalized
image coordinates. All functions are vmap/jit-safe with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpsfm_tpu.geometry.linalg import nullspace_vector, nullspace_vector_minimal, svd3x3
from mpsfm_tpu.geometry.rotations import Rigid3d, matrix_to_quat
from mpsfm_tpu.geometry.triangulation import triangulate_two_view


def _normalize_points(xy, mask):
    """Hartley normalization with masked statistics. xy (N,2), mask (N,)."""
    w = mask.astype(xy.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (xy * w[:, None]).sum(0) / n
    d = jnp.sqrt(((xy - mean) ** 2).sum(-1)) * w
    scale = jnp.sqrt(2.0) / jnp.maximum(d.sum() / n, 1e-12)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0]
        ],
        dtype=xy.dtype,
    )
    return (xy - mean) * scale, T


def essential_from_eight_points(xy1, xy2, mask=None, minimal: bool = False):
    """8-point algorithm on normalized image coords, essential-manifold projected.

    xy1, xy2: (N,2) with N>=8 (exactly 8 for a RANSAC sample -> minimal=True,
    which uses the QR nullspace — eigh(AᵀA) cannot resolve the degenerate
    spectrum of an exact minimal system in f32 on TPU).
    mask: optional (N,) weights. Returns E (3,3) with singular values (1,1,0).
    """
    N = xy1.shape[0]
    if mask is None:
        mask = jnp.ones((N,), dtype=bool)
    p1, T1 = _normalize_points(xy1, mask)
    p2, T2 = _normalize_points(xy2, mask)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    # Constraint: p2^T E p1 = 0 with E row-major flattened.
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1)
    if minimal:
        F = nullspace_vector_minimal(A).reshape(3, 3)
    else:
        F = nullspace_vector(A, mask.astype(A.dtype)).reshape(3, 3)
    F = T2.T @ F @ T1  # de-normalize
    # Project onto essential manifold: singular values (1, 1, 0).
    U, s, Vt = svd3x3(F)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=F.dtype)) @ Vt
    return E


def sampson_error_sq(E, xy1, xy2):
    """Squared Sampson distance in normalized coords. E (...,3,3), xy (...,N,2)."""
    ones = jnp.ones_like(xy1[..., :1])
    p1 = jnp.concatenate([xy1, ones], -1)
    p2 = jnp.concatenate([xy2, ones], -1)
    Ep1 = jnp.einsum("...ij,...nj->...ni", E, p1)
    Etp2 = jnp.einsum("...ji,...nj->...ni", E, p2)
    num = jnp.einsum("...ni,...ni->...n", p2, Ep1) ** 2
    den = Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2 + Etp2[..., 0] ** 2 + Etp2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def decompose_essential(E, xy1, xy2, mask):
    """E -> cam2_from_cam1 Rigid3d by cheirality voting over the 4 candidates.

    xy1, xy2: (N,2) normalized coords of (ideally inlier) matches; mask (N,).
    Returns (pose2: Rigid3d, votes: (4,), best_idx).
    """
    U, _, Vt = svd3x3(E)
    # Ensure proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    R1 = U @ _W.astype(E.dtype) @ Vt
    R2 = U @ _W.T.astype(E.dtype) @ Vt
    t = U[:, 2]
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])

    pose1 = Rigid3d.identity(dtype=E.dtype)

    def votes_for(R, tt):
        pose2 = Rigid3d(matrix_to_quat(R), tt)
        X = triangulate_two_view(
            Rigid3d(jnp.broadcast_to(pose1.quat, (xy1.shape[0], 4)), jnp.broadcast_to(pose1.t, (xy1.shape[0], 3))),
            Rigid3d(jnp.broadcast_to(pose2.quat, (xy1.shape[0], 4)), jnp.broadcast_to(pose2.t, (xy1.shape[0], 3))),
            xy1,
            xy2,
        )
        z1 = X[:, 2]
        Xc2 = jnp.einsum("ij,nj->ni", R, X) + tt
        z2 = Xc2[:, 2]
        good = (z1 > 1e-6) & (z2 > 1e-6) & mask
        return good.sum()

    votes = jnp.stack([votes_for(cands_R[i], cands_t[i]) for i in range(4)])
    best = jnp.argmax(votes)
    Rb = cands_R[best]
    tb = cands_t[best]
    return Rigid3d(matrix_to_quat(Rb), tb), votes, best
