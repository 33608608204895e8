"""Batched homography estimation (JAX) for two-view degeneracy classification.

Replaces the homography half of pycolmap.estimate_calibrated_two_view_geometry
(used by the reference's geometric verification,
mpsfm/sfm/scene/correspondences/utils.py:22-34): COLMAP estimates both E and
H and classifies the pair PLANAR/PANORAMIC when H explains comparably many
inliers.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpsfm_tpu.estimators.essential import _normalize_points
from mpsfm_tpu.geometry.linalg import nullspace_vector, nullspace_vector_minimal


def homography_from_four_points(xy1, xy2, mask=None, minimal: bool = False):
    """DLT homography from >=4 correspondences. xy (N,2) normalized or pixels.
    minimal=True (exactly 4 points) uses the QR nullspace (see linalg.py)."""
    N = xy1.shape[0]
    if mask is None:
        mask = jnp.ones((N,), dtype=bool)
    p1, T1 = _normalize_points(xy1, mask)
    p2, T2 = _normalize_points(xy2, mask)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    rows_a = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=-1)
    rows_b = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)
    if minimal:
        H = nullspace_vector_minimal(A).reshape(3, 3)
    else:
        m2 = jnp.concatenate([mask, mask]).astype(A.dtype)
        H = nullspace_vector(A, m2).reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def decompose_homography_np(H):
    """Calibrated homography (normalized coords) -> candidate
    (R, t_unit, n) triples, host-side (init-time only). Uses OpenCV's
    decomposeHomographyMat (Malis-Vargas) with K = I."""
    import cv2
    import numpy as np

    H = np.asarray(H, np.float64)
    _, Rs, ts, ns = cv2.decomposeHomographyMat(H, np.eye(3))
    out = []
    for R, t, n in zip(Rs, ts, ns):
        t = t.reshape(3)
        nrm = np.linalg.norm(t)
        if nrm > 1e-9:
            t = t / nrm
        out.append((R, t, n.reshape(3)))
    return out


def homography_transfer_error_sq(H, xy1, xy2):
    """Squared symmetric-free forward transfer error |H p1 - p2|^2."""
    ones = jnp.ones_like(xy1[..., :1])
    p1 = jnp.concatenate([xy1, ones], -1)
    q = jnp.einsum("...ij,...nj->...ni", H, p1)
    w = jnp.where(jnp.abs(q[..., 2]) < 1e-12, 1e-12, q[..., 2])
    proj = q[..., :2] / w[..., None]
    return ((proj - xy2) ** 2).sum(-1)
