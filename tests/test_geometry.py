import jax.numpy as jnp
import numpy as np
import pytest

from mpsfm_tpu.geometry.projection import (
    Camera,
    cam_from_img,
    img_from_cam,
    lift_to_world,
    project_points,
)
from mpsfm_tpu.geometry.rotations import (
    Rigid3d,
    apply_local_update,
    matrix_to_quat,
    projection_center,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    rigid_compose,
    rigid_inverse,
    rigid_transform,
    so3_exp_quat,
)
from mpsfm_tpu.geometry.triangulation import (
    has_positive_depth,
    pair_triangulation_angle,
    point_depth,
    triangulate_nview,
    triangulate_two_view_px,
    _pose_matrix,
)


def random_quat(rng, n=()):
    q = rng.normal(size=(*n, 4))
    return quat_normalize(jnp.asarray(q))


def test_quat_matrix_roundtrip(rng):
    q = random_quat(rng, (64,))
    R = quat_to_matrix(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-6)
    q2 = matrix_to_quat(R)
    # same rotation up to sign
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (32,))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    np.testing.assert_allclose(
        quat_rotate(q, v), jnp.einsum("nij,nj->ni", quat_to_matrix(q), v), atol=1e-6
    )


def test_quat_mul_composes(rng):
    q1, q2 = random_quat(rng, (8,)), random_quat(rng, (8,))
    v = jnp.asarray(rng.normal(size=(8, 3)))
    np.testing.assert_allclose(
        quat_rotate(quat_mul(q1, q2), v), quat_rotate(q1, quat_rotate(q2, v)), atol=1e-6
    )


def test_rigid_inverse_compose(rng):
    pose = Rigid3d(random_quat(rng, (5,)), jnp.asarray(rng.normal(size=(5, 3))))
    pts = jnp.asarray(rng.normal(size=(5, 3)))
    back = rigid_transform(rigid_inverse(pose), rigid_transform(pose, pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)
    comp = rigid_compose(rigid_inverse(pose), pose)
    np.testing.assert_allclose(rigid_transform(comp, pts), pts, atol=1e-5)


def test_so3_exp_small_angle():
    q = so3_exp_quat(jnp.zeros((3,)))
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-8)
    # exp of z-axis rotation by pi/2
    q = so3_exp_quat(jnp.array([0.0, 0.0, np.pi / 2]))
    v = quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)


def test_apply_local_update_first_order(rng):
    pose = Rigid3d(random_quat(rng), jnp.asarray(rng.normal(size=3)))
    omega = jnp.array([1e-4, -2e-4, 3e-4])
    dt = jnp.array([1e-3, 0.0, -1e-3])
    new = apply_local_update(pose, omega, dt)
    pts = jnp.asarray(rng.normal(size=(4, 3)))
    expected = rigid_transform(pose, pts) + jnp.cross(omega, quat_rotate(pose.quat, pts)) + dt
    np.testing.assert_allclose(rigid_transform(new, pts), expected, atol=1e-6)


def test_projection_roundtrip(rng):
    cam = Camera.from_params(jnp.array([600.0, 610.0, 320.0, 240.0]), 640, 480)
    pose = Rigid3d(random_quat(rng), jnp.asarray(rng.normal(size=3) * 0.1))
    pts_cam = jnp.asarray(rng.uniform(1.0, 5.0, size=(50, 3)) * np.array([0.4, 0.4, 1.0]))
    pts = rigid_transform(rigid_inverse(pose), pts_cam)
    px, depth = project_points(pose, cam, pts)
    assert (np.asarray(depth) > 0).all()
    lifted = lift_to_world(pose, cam, px, depth)
    np.testing.assert_allclose(lifted, pts, atol=1e-5)


def test_cam_img_inverse():
    cam = Camera.from_params(jnp.array([600.0, 610.0, 320.0, 240.0]))
    xy = jnp.array([[10.0, 20.0], [300.0, 200.0]])
    np.testing.assert_allclose(img_from_cam(cam, cam_from_img(cam, xy)), xy, atol=1e-4)


def make_two_view(rng, n=40, baseline=1.0):
    cam = Camera.from_params(jnp.array([500.0, 500.0, 320.0, 240.0]), 640, 480)
    pose1 = Rigid3d.identity()
    omega = jnp.array([0.02, -0.4, 0.01])
    pose2 = Rigid3d(so3_exp_quat(omega), jnp.array([-baseline, 0.0, 0.1]))
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n), rng.uniform(3.0, 8.0, n)], -1
        )
    )
    px1, d1 = project_points(pose1, cam, pts)
    px2, d2 = project_points(pose2, cam, pts)
    return cam, pose1, pose2, pts, px1, px2


def test_triangulate_two_view(rng):
    cam, pose1, pose2, pts, px1, px2 = make_two_view(rng)
    X = triangulate_two_view_px(pose1, pose2, cam, cam, px1, px2)
    np.testing.assert_allclose(X, pts, atol=1e-3)
    assert np.all(np.asarray(has_positive_depth(pose1, X)))
    ang = pair_triangulation_angle(pose1, pose2, X)
    assert (np.asarray(ang) > np.deg2rad(1.0)).all()


def test_triangulate_nview(rng):
    cam, pose1, pose2, pts, px1, px2 = make_two_view(rng, n=10)
    pose3 = Rigid3d(so3_exp_quat(jnp.array([0.0, 0.3, 0.0])), jnp.array([0.8, 0.1, 0.0]))
    px3, _ = project_points(pose3, cam, pts)
    poses_mat = jnp.stack([_pose_matrix(p) for p in (pose1, pose2, pose3)])
    for i in range(10):
        xy_norm = jnp.stack(
            [
                cam_from_img(cam, px1[i]),
                cam_from_img(cam, px2[i]),
                cam_from_img(cam, px3[i]),
            ]
        )
        X, ok = triangulate_nview(poses_mat, xy_norm, jnp.ones(3, bool))
        assert bool(ok)
        np.testing.assert_allclose(X, pts[i], atol=1e-3)


def test_point_depth(rng):
    pose = Rigid3d(random_quat(rng), jnp.asarray(rng.normal(size=3)))
    pts = jnp.asarray(rng.normal(size=(7, 3)))
    np.testing.assert_allclose(
        point_depth(pose, pts), rigid_transform(pose, pts)[:, 2], atol=1e-6
    )
