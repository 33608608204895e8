import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.estimators.essential import (
    decompose_essential,
    essential_from_eight_points,
    sampson_error_sq,
)
from mpsfm_tpu.estimators.pnp import pnp_from_six_points, refine_pose_gn
from mpsfm_tpu.estimators.ransac import ransac_essential, ransac_pnp
from mpsfm_tpu.estimators.two_view import (
    TwoViewConfig,
    estimate_two_view_geometry,
    estimate_two_view_geometry_batch,
)
from mpsfm_tpu.geometry.projection import Camera, cam_from_img, project_points
from mpsfm_tpu.geometry.rotations import (
    Rigid3d,
    quat_mul,
    quat_conj,
    quat_rotate,
    rigid_inverse,
    rigid_transform,
    so3_exp_quat,
)


CAM = Camera.from_params(jnp.array([500.0, 500.0, 320.0, 240.0]), 640, 480)


def make_scene(rng, n=100, planar=False):
    if planar:
        xy = rng.uniform(-2, 2, size=(n, 2))
        pts = np.stack([xy[:, 0], xy[:, 1], 4.0 + 0.3 * xy[:, 0]], -1)
    else:
        pts = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 9, n)], -1
        )
    pose1 = Rigid3d.identity()
    pose2 = Rigid3d(so3_exp_quat(jnp.array([0.03, -0.25, 0.01])), jnp.array([-1.0, 0.1, 0.15]))
    pts = jnp.asarray(pts, jnp.float32)
    px1, _ = project_points(pose1, CAM, pts)
    px2, _ = project_points(pose2, CAM, pts)
    return pose1, pose2, pts, px1, px2


def rot_angle_deg(q1, q2):
    dq = quat_mul(quat_conj(q1), q2)
    return float(np.rad2deg(2 * np.arccos(np.clip(abs(float(dq[0])), -1, 1))))


def test_eight_point_exact(rng):
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=60)
    xy1 = cam_from_img(CAM, px1)
    xy2 = cam_from_img(CAM, px2)
    E = essential_from_eight_points(xy1, xy2)
    err = sampson_error_sq(E, xy1, xy2)
    assert float(jnp.max(err)) < 1e-8


def test_decompose_essential_recovers_pose(rng):
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=60)
    xy1 = cam_from_img(CAM, px1)
    xy2 = cam_from_img(CAM, px2)
    E = essential_from_eight_points(xy1, xy2)
    pose, votes, _ = decompose_essential(E, xy1, xy2, jnp.ones(60, bool))
    assert rot_angle_deg(pose.quat, pose2.quat) < 0.5
    # translation up to scale
    t_est = np.asarray(pose.t) / np.linalg.norm(pose.t)
    t_gt = np.asarray(pose2.t) / np.linalg.norm(pose2.t)
    assert np.abs(t_est - t_gt).max() < 0.01
    assert int(votes.max()) == 60


def test_ransac_essential_with_outliers(rng):
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=200)
    xy1 = np.array(cam_from_img(CAM, px1))
    xy2 = np.array(cam_from_img(CAM, px2))
    # corrupt 40% with random correspondences
    n_out = 80
    xy2[:n_out] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    thresh = (4.0 / 500.0) ** 2
    out = ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(xy1), jnp.asarray(xy2), jnp.ones(200, bool), thresh
    )
    assert int(out["num_inliers"]) >= 115
    mask = np.asarray(out["inlier_mask"])
    assert mask[n_out:].mean() > 0.95
    assert mask[:n_out].mean() < 0.1
    assert rot_angle_deg(out["pose"].quat, pose2.quat) < 1.0


def test_pnp_six_points_exact(rng):
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=50)
    xy2 = cam_from_img(CAM, px2)
    pose = pnp_from_six_points(pts, xy2)
    assert rot_angle_deg(pose.quat, pose2.quat) < 0.1
    np.testing.assert_allclose(np.asarray(pose.t), np.asarray(pose2.t), atol=5e-3)


def test_ransac_pnp_with_outliers_and_refinement(rng):
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=300)
    xy2 = np.array(cam_from_img(CAM, px2))
    xy2 += rng.normal(scale=0.5 / 500.0, size=xy2.shape)  # 0.5px noise
    n_out = 90
    xy2[:n_out] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    thresh = (4.0 / 500.0) ** 2
    out = ransac_pnp(
        jax.random.PRNGKey(1), pts, jnp.asarray(xy2, jnp.float32), jnp.ones(300, bool), thresh
    )
    assert int(out["num_inliers"]) >= 200
    assert rot_angle_deg(out["pose"].quat, pose2.quat) < 0.5
    np.testing.assert_allclose(np.asarray(out["pose"].t), np.asarray(pose2.t), atol=0.02)


def test_two_view_geometry_classification(rng):
    # General 3D scene -> CALIBRATED
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=150)
    matches = np.stack([np.arange(150), np.arange(150)], -1)
    tvg = estimate_two_view_geometry(CAM, CAM, np.asarray(px1), np.asarray(px2), matches)
    assert tvg.config == TwoViewConfig.CALIBRATED
    assert tvg.num_inliers > 130
    assert tvg.tri_angle > 3.0

    # Planar scene -> PLANAR_OR_PANORAMIC
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=150, planar=True)
    tvg = estimate_two_view_geometry(CAM, CAM, np.asarray(px1), np.asarray(px2), matches)
    assert tvg.config == TwoViewConfig.PLANAR_OR_PANORAMIC


def test_two_view_geometry_batch_and_invert(rng):
    scenes = [make_scene(rng, n=n) for n in (50, 120, 120)]
    pairs = [
        (CAM, CAM, np.asarray(px1), np.asarray(px2), np.stack([np.arange(len(px1))] * 2, -1))
        for _, _, _, px1, px2 in scenes
    ]
    out = estimate_two_view_geometry_batch(pairs)
    assert len(out) == 3
    for tvg in out:
        assert tvg.config == TwoViewConfig.CALIBRATED
    inv = out[0].invert()
    # pose composed with its inverse ~ identity
    q = quat_mul(jnp.asarray(inv.pose.quat, jnp.float32), jnp.asarray(out[0].pose.quat, jnp.float32))
    assert abs(float(q[0])) > 0.9999


def test_two_view_geometry_too_few_matches():
    matches = np.zeros((3, 2), int)
    tvg = estimate_two_view_geometry(CAM, CAM, np.zeros((5, 2)), np.zeros((5, 2)), matches)
    assert tvg.config == TwoViewConfig.DEGENERATE
    assert tvg.num_inliers == 0


def test_homography_pose_recovery_planar(rng):
    """H-decomposition recovers relative pose on a pure plane (E degenerates)."""
    from mpsfm_tpu.mapper.registration import run_ransac_homography_pose
    from mpsfm_tpu.scene.reconstruction import quat_to_matrix_np

    pose1, pose2, pts, px1, px2 = make_scene(rng, n=150, planar=True)
    xy1 = np.asarray(cam_from_img(CAM, px1))
    xy2 = np.asarray(cam_from_img(CAM, px2))
    # plane normal for scene: n ~ (0.3 z-slope) from make_scene planar: z = 4 + 0.3x
    # plane: z - 0.3x = 4 -> n ∝ (-0.3, 0, 1); toward camera: (0.3, 0, -1)
    n_prior = np.array([0.3, 0.0, -1.0]) / np.linalg.norm([0.3, 0, 1.0])
    out = run_ransac_homography_pose(xy1, xy2, (4.0 / 500.0) ** 2, num_hyp=256, prior_normal=n_prior)
    assert out["num_inliers"] > 120
    q_est = out["pose"].q
    assert rot_angle_deg(jnp.asarray(q_est, jnp.float32), pose2.quat) < 1.0
    t_est = out["pose"].t / np.linalg.norm(out["pose"].t)
    t_gt = np.asarray(pose2.t) / np.linalg.norm(pose2.t)
    assert min(np.abs(t_est - t_gt).max(), np.abs(t_est + t_gt).max()) < 0.05


def test_ransac_pnp_on_coplanar_points(rng):
    """Regression (round 4): EXACTLY coplanar 3D points — the 6-pt DLT
    nullspace is 4-D (P + qπᵀ for the plane π), so the plain
    smallest-vector hypothesis returns ~0 inliers (found live: lifted
    clouds from INTEGRATED depth are near-exactly planar; cv2 P3P got
    148/156 while ransac_pnp got 0). The homography-based planar
    hypothesis family must recover the pose."""
    pose1, pose2, pts, px1, px2 = make_scene(rng, n=200, planar=True)
    xy2 = np.array(cam_from_img(CAM, px2))
    xy2 += rng.normal(scale=0.5 / 500.0, size=xy2.shape)
    thresh = (4.0 / 500.0) ** 2
    out = ransac_pnp(
        jax.random.PRNGKey(3), pts, jnp.asarray(xy2, jnp.float32), jnp.ones(200, bool), thresh
    )
    assert int(out["num_inliers"]) >= 160, int(out["num_inliers"])
    assert rot_angle_deg(out["pose"].quat, pose2.quat) < 0.5
    np.testing.assert_allclose(np.asarray(out["pose"].t), np.asarray(pose2.t), atol=0.02)


def test_pnp_from_plane_exact(rng):
    """The homography-based planar solver recovers the pose exactly from
    coplanar points (where the 6-pt DLT is degenerate)."""
    from mpsfm_tpu.estimators.pnp import pnp_from_plane

    pose1, pose2, pts, px1, px2 = make_scene(rng, n=12, planar=True)
    xy2 = cam_from_img(CAM, px2)
    pose = pnp_from_plane(pts, jnp.asarray(xy2))
    assert rot_angle_deg(pose.quat, pose2.quat) < 0.2
    np.testing.assert_allclose(np.asarray(pose.t), np.asarray(pose2.t), atol=1e-2)
