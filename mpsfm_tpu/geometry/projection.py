"""Camera models and projection, batched JAX.

Supports PINHOLE (fx, fy, cx, cy) and SIMPLE_PINHOLE (f, cx, cy), the
models the reference pipeline actually instantiates (its SimpleParser
builds PINHOLE cameras from intrinsics.yaml — reference:
mpsfm/data_proc/simple.py:14-91).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mpsfm_tpu.geometry.rotations import Rigid3d, quat_rotate, quat_conj

PINHOLE = 1
SIMPLE_PINHOLE = 0


class Camera(NamedTuple):
    """Pinhole camera. fx, fy, cx, cy are scalars (or batched)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = 0
    height: int = 0

    @staticmethod
    def from_params(params, width=0, height=0):
        params = jnp.asarray(params)
        if params.shape[-1] == 3:  # SIMPLE_PINHOLE
            f, cx, cy = params[..., 0], params[..., 1], params[..., 2]
            return Camera(f, f, cx, cy, width, height)
        fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
        return Camera(fx, fy, cx, cy, width, height)

    def calibration_matrix(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


def cam_from_img(camera: Camera, xy):
    """Pixel coords (...,2) -> normalized image-plane coords (...,2)."""
    return jnp.stack(
        [(xy[..., 0] - camera.cx) / camera.fx, (xy[..., 1] - camera.cy) / camera.fy],
        axis=-1,
    )


def img_from_cam(camera: Camera, xy_norm):
    """Normalized image-plane coords (...,2) -> pixel coords (...,2)."""
    return jnp.stack(
        [xy_norm[..., 0] * camera.fx + camera.cx, xy_norm[..., 1] * camera.fy + camera.cy],
        axis=-1,
    )


def project_points(pose: Rigid3d, camera: Camera, points3d, eps=1e-9):
    """World points (...,3) -> (pixels (...,2), depth (...))."""
    p_cam = quat_rotate(pose.quat, points3d) + pose.t
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < eps, jnp.sign(z) * eps + (z == 0) * eps, z)
    xy_norm = p_cam[..., :2] / zs[..., None]
    return img_from_cam(camera, xy_norm), z


def lift_to_cam(camera: Camera, xy, depth):
    """Pixels (...,2) + depth (...) -> camera-frame 3D points (...,3)."""
    xy_norm = cam_from_img(camera, xy)
    return jnp.concatenate([xy_norm, jnp.ones_like(xy_norm[..., :1])], -1) * depth[..., None]


def lift_to_world(pose: Rigid3d, camera: Camera, xy, depth):
    """Pixels + depth -> world points, via the inverse of cam_from_world.

    Mirrors the reference's depth-lifting (mpsfm/sfm/mapper/registration.py:375-391).
    """
    p_cam = lift_to_cam(camera, xy, depth)
    qinv = quat_conj(pose.quat)
    return quat_rotate(qinv, p_cam - pose.t)


def unproject_depth_map(pose: Rigid3d, camera: Camera, depth):
    """Dense depth map (H,W) -> world points (H,W,3)."""
    H, W = depth.shape
    x = jnp.arange(W, dtype=depth.dtype)
    y = jnp.arange(H, dtype=depth.dtype)
    xx, yy = jnp.meshgrid(x, y)
    xy = jnp.stack([xx, yy], axis=-1)
    return lift_to_world(pose, camera, xy, depth)
