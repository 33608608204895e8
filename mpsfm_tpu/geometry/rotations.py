"""Quaternion / SE(3) math as pure JAX functions.

All functions are batched (leading dims broadcast) and jit/vmap-safe.
Quaternions use (w, x, y, z) ordering and represent world->cam (or any
frame-to-frame) rotations, matching COLMAP's Rigid3d semantics
(reference: pycolmap Rigid3d used throughout mpsfm/sfm/).

A pose ("cam_from_world") is the pair ``(quat, t)`` with
``x_cam = R(quat) @ x_world + t``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Rigid3d(NamedTuple):
    """SE(3) transform: x_out = R(quat) x_in + t. quat is (...,4) wxyz, t is (...,3)."""

    quat: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32):
        q = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], dtype=dtype), (*batch_shape, 4))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return Rigid3d(q, t)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        axis=-2,
    )
    return R


def matrix_to_quat(R):
    """Rotation matrix (...,3,3) -> quaternion (...,4) wxyz. Branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (un-normalized), one per pivot choice.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    idx = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4 cand, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def so3_exp_quat(omega):
    """Axis-angle (...,3) -> quaternion. Safe at omega=0 via Taylor expansion."""
    theta_sq = jnp.sum(omega**2, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + 1e-32)
    half = 0.5 * theta
    small = theta_sq < 1e-12
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small[..., 0], 1.0 - theta_sq[..., 0] / 8.0, jnp.cos(half[..., 0]))
    return jnp.concatenate([w[..., None], sinc_half * omega], axis=-1)


def rigid_transform(pose: Rigid3d, points):
    """Apply pose to points (...,3)."""
    return quat_rotate(pose.quat, points) + pose.t


def rigid_inverse(pose: Rigid3d) -> Rigid3d:
    qinv = quat_conj(pose.quat)
    return Rigid3d(qinv, -quat_rotate(qinv, pose.t))


def rigid_compose(a: Rigid3d, b: Rigid3d) -> Rigid3d:
    """Returns a∘b: (a∘b)(x) = a(b(x))."""
    return Rigid3d(quat_normalize(quat_mul(a.quat, b.quat)), quat_rotate(a.quat, b.t) + a.t)


def projection_center(pose: Rigid3d):
    """Camera center in world frame for a cam_from_world pose."""
    return -quat_rotate(quat_conj(pose.quat), pose.t)


def apply_local_update(pose: Rigid3d, omega, dt) -> Rigid3d:
    """Left-perturbation retraction used by the LM solver.

    R' = exp(omega) R,  t' = t + dt. Matches the EigenQuaternion +
    additive-translation parametrization of the reference's Ceres BA
    (mpsfm/sfm/mapper/bundle_adjustment.py:114-122) up to first order.
    """
    dq = so3_exp_quat(omega)
    return Rigid3d(quat_normalize(quat_mul(dq, pose.quat)), pose.t + dt)
