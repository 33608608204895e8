"""Small-matrix linear algebra tuned for TPU compile times.

jnp.linalg.svd lowers to a large iterative program that costs seconds of
compile time *per call site* on TPU backends; minimal-solver RANSAC kernels
instantiate dozens of such sites. These helpers reformulate everything the
SfM solvers need in terms of jnp.linalg.eigh (symmetric, ~5x cheaper to
compile) plus closed forms:

  - nullspace vector of a tall A  ->  smallest eigenvector of AᵀA
  - SVD of a 3x3                  ->  eigh of MᵀM + cross-product completion

The AᵀA formulation squares the condition number, which is acceptable here
because all solver inputs are Hartley-normalized first (f32 suffices at
the normalized scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# On TPU, default matmul precision runs f32 contractions through bf16
# passes — fatal for normal-equation nullspaces (AᵀA already squares the
# conditioning). Force full f32 accumulation in everything here.
_HIGHEST = jax.lax.Precision.HIGHEST


def smallest_eigvec(S):
    """Eigenvector of the smallest eigenvalue of symmetric S (...,n,n)."""
    _, v = jnp.linalg.eigh(S)  # ascending eigenvalues
    return v[..., :, 0]


def nullspace_vector(A, weights=None, polish_iters: int = 2):
    """Unit vector x minimizing ||diag(w) A x|| for tall A (...,m,n).

    eigh(AᵀA) + a few shifted inverse-iteration polish steps: the squaring
    costs ~half the f32 mantissa, and near-minimal systems have eigenvalue
    gaps below f32 eps — inverse iteration re-sharpens the smallest
    eigenvector at the cost of one batched n×n solve per step.
    """
    if weights is not None:
        A = A * weights[..., :, None]
    AtA = jnp.einsum("...mi,...mj->...ij", A, A, precision=_HIGHEST)
    v = smallest_eigvec(AtA)
    n = AtA.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    shifted = AtA + (1e-6 / n) * tr * jnp.eye(n, dtype=AtA.dtype)
    for _ in range(polish_iters):
        v = jnp.linalg.solve(shifted, v[..., None])[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def nullspace_vector_minimal(A):
    """Exact-nullspace vector of a minimal system A (...,m,n) with m = n-1
    (or rank n-1): the last column of the complete QR of Aᵀ. No squaring,
    so f32 handles the degenerate spectrum that breaks eigh(AᵀA) here."""
    Q, _ = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="complete")
    return Q[..., :, -1]


def svd3x3(M, eps=1e-12):
    """SVD of a 3x3 (...,3,3) via eigh(MᵀM): returns (U, s, Vt).

    Singular values are descending; the smallest-singular-value column of U
    is completed by a cross product so it stays well-defined when s2 ~= 0
    (the essential-matrix case).
    """
    G = jnp.einsum("...ji,...jk->...ik", M, M, precision=_HIGHEST)  # MᵀM
    w, V = jnp.linalg.eigh(G)  # ascending
    w = w[..., ::-1]
    V = V[..., :, ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0))
    MV = jnp.einsum("...ij,...jk->...ik", M, V, precision=_HIGHEST)
    u0 = MV[..., :, 0] / jnp.maximum(s[..., 0, None], eps)
    u1 = MV[..., :, 1] / jnp.maximum(s[..., 1, None], eps)
    # Orthonormalize defensively and complete with the cross product.
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0, axis=-1, keepdims=True), eps)
    u1 = u1 - jnp.sum(u0 * u1, -1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), eps)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)
