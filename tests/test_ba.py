import jax.numpy as jnp
import numpy as np
import pytest

from mpsfm_tpu.ba import losses
from mpsfm_tpu.ba.covariance import calculate_point_covs, point_covariances
from mpsfm_tpu.ba.problem import apply_ba_result, build_ba_data
from mpsfm_tpu.ba.shift_scale import (
    fit_robust_gaussian_mad,
    optimize_prior_shiftscale,
    update_truncation_multiplier,
)
from mpsfm_tpu.ba.solver import solve_ba
from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Pose, Reconstruction


def make_synthetic_rec(rng, n_cams=6, n_pts=200, noise_px=1.0, pose_noise=0.02):
    """Ground-truth scene + noisy initialization. Returns (rec, gt)."""
    rec = Reconstruction()
    cam = HostCamera(1, np.array([500.0, 500.0, 320.0, 240.0]), 640, 480)
    rec.add_camera(cam)
    pts = np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts), rng.uniform(4, 9, n_pts)], -1
    )
    gt_poses = []
    for i in range(n_cams):
        # cameras along x with small rotations
        q = np.array([1.0, 0, 0.02 * i, 0])
        q /= np.linalg.norm(q)
        t = np.array([-0.4 * i, 0.02 * i, 0.1 * i])
        gt_poses.append(Pose(q, t))
        im = ImageRecord(i, f"im{i}.jpg", 1)
        p_cam = gt_poses[i].transform(pts)
        px = cam.img_from_cam(p_cam[:, :2] / p_cam[:, 2:3])
        im.keypoints = px + rng.normal(scale=noise_px, size=px.shape)
        im.point3D_ids = np.full(n_pts, -1, np.int64)
        # noisy init pose (keep first two at GT for gauge)
        if i < 2:
            im.pose = Pose(q.copy(), t.copy())
        else:
            dq = np.concatenate([[1.0], rng.normal(scale=pose_noise, size=3)])
            dq /= np.linalg.norm(dq)
            from mpsfm_tpu.scene.reconstruction import quat_rotate_np

            im.pose = Pose(
                np.array(
                    [
                        dq[0] * q[0] - dq[1:] @ q[1:],
                        *(dq[0] * q[1:] + q[0] * dq[1:] + np.cross(dq[1:], q[1:])),
                    ]
                ),
                t + rng.normal(scale=pose_noise * 5, size=3),
            )
        im.registered = True
        rec.add_image(im)
    for k in range(n_pts):
        track = [(i, k) for i in range(n_cams)]
        rec.add_point3D(pts[k] + rng.normal(scale=0.05, size=3), track)
    gt = {"pts": pts, "poses": gt_poses}
    return rec, gt


def pose_errors(rec, gt):
    rot, trans = [], []
    for i, pose_gt in enumerate(gt["poses"]):
        p = rec.images[i].pose
        dq = abs(np.dot(p.q, pose_gt.q))
        rot.append(np.rad2deg(2 * np.arccos(np.clip(dq, -1, 1))))
        trans.append(np.linalg.norm(p.t - pose_gt.t))
    return np.array(rot), np.array(trans)


def test_ba_converges_to_gt(rng):
    rec, gt = make_synthetic_rec(rng, noise_px=0.5)
    bundle = {"optim_ids": set(range(6)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    prob = build_ba_data(rec, bundle, mode="global", use_depth=False)
    quat, t, xyz, info = solve_ba(prob.data, max_iters=25)
    assert float(info["cost"]) < float(info["cost0"]) * 0.2
    apply_ba_result(rec, prob, quat, t, xyz)
    rot, trans = pose_errors(rec, gt)
    assert rot.max() < 0.2, rot
    assert trans.max() < 0.05, trans
    # mean point error small
    err = np.linalg.norm(rec.xyz[rec.point_ids()] - gt["pts"], axis=1)
    assert np.median(err) < 0.1


def test_ba_gauge_fixed(rng):
    rec, gt = make_synthetic_rec(rng)
    bundle = {"optim_ids": set(range(6)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    prob = build_ba_data(rec, bundle, mode="global", use_depth=False)
    q0, t0 = np.array(rec.images[0].pose.q), np.array(rec.images[0].pose.t)
    tx1 = rec.images[1].pose.t[0]
    quat, t, xyz, info = solve_ba(prob.data, max_iters=10)
    apply_ba_result(rec, prob, quat, t, xyz)
    np.testing.assert_allclose(rec.images[0].pose.q, q0, atol=1e-6)
    np.testing.assert_allclose(rec.images[0].pose.t, t0, atol=1e-6)
    np.testing.assert_allclose(rec.images[1].pose.t[0], tx1, atol=1e-5)


def test_ba_fix_pose_refines_points_only(rng):
    rec, gt = make_synthetic_rec(rng, pose_noise=0.0, noise_px=0.5)
    bundle = {"optim_ids": set(range(6)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    poses_before = {i: (rec.images[i].pose.q.copy(), rec.images[i].pose.t.copy()) for i in range(6)}
    prob = build_ba_data(rec, bundle, mode="global", fix_pose=True, use_depth=False)
    quat, t, xyz, info = solve_ba(prob.data, max_iters=15)
    apply_ba_result(rec, prob, quat, t, xyz)
    for i in range(6):
        np.testing.assert_allclose(rec.images[i].pose.q, poses_before[i][0], atol=1e-6)
    err = np.linalg.norm(rec.xyz[rec.point_ids()] - gt["pts"], axis=1)
    assert np.median(err) < 0.1


def test_ba_robust_loss_rejects_outliers(rng):
    rec, gt = make_synthetic_rec(rng, noise_px=0.5, pose_noise=0.01)
    # corrupt 10% of observations of image 3 badly
    im = rec.images[3]
    im.keypoints[:20] += 80.0
    bundle = {"optim_ids": set(range(6)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    prob = build_ba_data(rec, bundle, mode="global", use_depth=False)
    quat, t, xyz, _ = solve_ba(prob.data, max_iters=25)
    apply_ba_result(rec, prob, quat, t, xyz)
    rot, trans = pose_errors(rec, gt)
    assert rot.max() < 0.5
    assert trans.max() < 0.05


class FakeDepth:
    """Minimal depth stub exposing the BA-facing interface."""

    def __init__(self, rec, imid, scale_err=1.0, sigma=0.05):
        self.rec = rec
        self.imid = imid
        self.activated = True
        self.scale = 1.0
        im = rec.images[imid]
        kp_ids = im.observed_kp_ids()
        pids = im.point3D_ids[kp_ids]
        _, z = rec.project_points_into_image(imid, pids)
        self._depth = {int(k): float(zz) * scale_err for k, zz in zip(kp_ids, z)}
        self.uncertainty_update = {int(k): sigma**2 for k in kp_ids}
        self.data = "nonnull"

    def valid_at_kps(self, kps):
        return np.ones(len(kps), bool)

    def data_at_kps(self, kps):
        # keyed by order of observed kps
        im = self.rec.images[self.imid]
        kp_ids = im.observed_kp_ids()
        return np.array([self._depth[int(k)] for k in kp_ids[: len(kps)]])

    def data_prior_at_kps(self, kps):
        return self.data_at_kps(kps)


def test_ba_with_depth_priors_fixes_scale_drift(rng):
    """Depth residuals should pull a scale-drifted init toward metric scale."""
    rec, gt = make_synthetic_rec(rng, noise_px=0.3, pose_noise=0.0)
    # attach GT-consistent depth priors
    for i in range(6):
        rec.images[i].depth = FakeDepth(rec, i)
    # drift: scale all points and translations by 1.1 except gauge-fixed dims
    for pid in rec.point_ids():
        rec.xyz[pid] *= 1.1
    for i in range(6):
        rec.images[i].pose.t = rec.images[i].pose.t * 1.1
    bundle = {"optim_ids": set(range(6)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    # free gauge scale: fix_pose=False still freezes pose1 tx -> scale is
    # gauge-fixed. Depth terms act on absolute depths, so keep standard gauge
    # but verify cost including depth decreases drastically.
    prob = build_ba_data(rec, bundle, mode="global", use_depth=True)
    assert int(prob.data.d_valid.sum()) > 0
    quat, t, xyz, info = solve_ba(prob.data, max_iters=30)
    assert float(info["cost"]) < 0.1 * float(info["cost0"])


def test_point_covariance_sanity(rng):
    rec, gt = make_synthetic_rec(rng, n_cams=4, n_pts=50, noise_px=1.0, pose_noise=0.0)
    bundle = {"optim_ids": set(range(4)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    prob = build_ba_data(rec, bundle, mode="global", use_depth=False)
    cov = calculate_point_covs(rec, prob)
    assert len(rec.point_covs) == 50
    c = cov[:50]
    # symmetric positive diagonal
    np.testing.assert_allclose(c, np.swapaxes(c, 1, 2), atol=1e-5)
    assert (np.einsum("pii->pi", c) > 0).all()
    # deeper points have larger depth variance than closer ones on average
    zs = gt["pts"][:, 2]
    zvar = c[:, 2, 2]
    assert np.corrcoef(zs, zvar)[0, 1] > 0.2


def test_shift_scale_estimator(rng):
    rec, gt = make_synthetic_rec(rng, n_cams=3, n_pts=80, noise_px=0.0, pose_noise=0.0)
    # depth priors that are 2x too small -> estimator should find scale ~2
    for i in range(3):
        fd = FakeDepth(rec, i, scale_err=0.5)
        fd.activated = False
        rec.images[i].depth = fd
    bundle = {"optim_ids": {0, 1, 2}, "pts3D": set(rec.point_ids().tolist())}
    ss, ok = optimize_prior_shiftscale(rec, bundle)
    assert ok
    for imid, (shift, scale) in ss.items():
        assert abs(scale - 2.0) < 0.05
        assert shift == 0.0


def test_truncation_multiplier(rng):
    rec, gt = make_synthetic_rec(rng, n_cams=3, n_pts=100, noise_px=0.0, pose_noise=0.0)
    for i in range(3):
        rec.images[i].depth = FakeDepth(rec, i, sigma=0.1)
    # perfect depths -> whitened residuals ~0 -> sigma ~0
    m = update_truncation_multiplier(rec, [0, 1, 2])
    assert m < 0.1
    mu, sigma = fit_robust_gaussian_mad(np.array([0.0, 1, 2, 3, 4, 100.0]))
    assert abs(mu - 2.5) < 1e-9
    assert sigma < 5


def test_losses_match_ceres_forms():
    s = jnp.array([0.0, 1.0, 4.0, 100.0])
    a = 1.5
    np.testing.assert_allclose(losses.rho(losses.TRIVIAL, s, a), s)
    np.testing.assert_allclose(
        losses.rho(losses.SOFT_L1, s, a), 2 * a**2 * (np.sqrt(1 + s / a**2) - 1), rtol=1e-6
    )
    np.testing.assert_allclose(
        losses.rho(losses.CAUCHY, s, a), a**2 * np.log1p(s / a**2), rtol=1e-6
    )
    # derivative check
    eps = 1e-3
    for lid in (losses.SOFT_L1, losses.CAUCHY):
        num = (losses.rho(lid, s + eps, a) - losses.rho(lid, s - eps, a)) / (2 * eps)
        np.testing.assert_allclose(losses.rho_prime(lid, s, a), num, rtol=1e-2, atol=1e-3)


def test_point_covariance_matches_dense_inverse(rng):
    """cov_p from the Schur identity == corresponding block of the dense
    H^-1 built explicitly (tiny problem)."""
    import jax.numpy as jnp

    from mpsfm_tpu.ba import losses as L
    from mpsfm_tpu.ba.covariance import point_covariances
    from mpsfm_tpu.ba.solver import _assemble, _cam_reduce_last, _seg_reduce_last

    rec, gt = make_synthetic_rec(rng, n_cams=3, n_pts=6, noise_px=0.5, pose_noise=0.0)
    bundle = {"optim_ids": {0, 1, 2}, "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    prob = build_ba_data(rec, bundle, mode="global", use_depth=False)
    d = prob.data
    cov = np.asarray(point_covariances(d))

    # dense H over [cam dofs (6C) | point dofs (3P)]
    asm = _assemble(d, d.quat, d.t, d.xyz, L.TRIVIAL, L.TRIVIAL)
    J_r = np.asarray(asm["J_r"])  # (2,9,No)
    w = np.asarray(asm["w_r"])
    C = d.quat.shape[0]
    P = d.xyz.shape[0]
    No = w.shape[0]
    r_cam = np.asarray(d.r_cam)
    r_pt = np.asarray(d.r_pt)
    n_dof = 6 * C + 3 * P
    H = np.zeros((n_dof, n_dof))
    for n in range(No):
        Jn = np.zeros((2, n_dof))
        Jn[:, 6 * r_cam[n] : 6 * r_cam[n] + 6] = J_r[:, :6, n]
        Jn[:, 6 * C + 3 * r_pt[n] : 6 * C + 3 * r_pt[n] + 3] = J_r[:, 6:, n]
        H += w[n] * Jn.T @ Jn
    # same regularization as point_covariances
    cam_dof = np.asarray(d.cam_dof)
    for c in range(C):
        for k in range(6):
            H[6 * c + k, 6 * c + k] += (1.0 - cam_dof[c, k]) + 1e-6
    pv = np.asarray(d.point_var)
    for p in range(P):
        for k in range(3):
            H[6 * C + 3 * p + k, 6 * C + 3 * p + k] += (1.0 - pv[p]) + 1e-6
    Hinv = np.linalg.inv(H)
    for p in range(6):  # real points only
        blk = Hinv[6 * C + 3 * p : 6 * C + 3 * p + 3, 6 * C + 3 * p : 6 * C + 3 * p + 3]
        np.testing.assert_allclose(cov[p], blk, rtol=0.08, atol=5e-4)


def test_dense_ba_matches_sparse(rng):
    """Gather-free dense (C,P) solver reaches the same solution as the
    sparse slot-table solver on the same problem (incl. depth priors)."""
    from mpsfm_tpu.ba.dense import densify, solve_ba_dense

    rec, gt = make_synthetic_rec(rng, noise_px=0.5, pose_noise=0.02)
    bundle = {"optim_ids": set(range(6)), "pts3D": set(rec.point_ids().tolist()), "constpoints": set()}
    prob = build_ba_data(rec, bundle, mode="global", use_depth=False)
    qs, ts, xs, info_s = solve_ba(prob.data, max_iters=25)
    C, P = prob.data.quat.shape[0], prob.data.xyz.shape[0]
    ddata = densify(prob.data, C, P)
    qd, td, xd, info_d = solve_ba_dense(ddata, max_iters=25)
    assert float(info_d["cost"]) < float(info_d["cost0"]) * 0.2
    # same converged optimum (both reach GT-ish): compare against sparse
    np.testing.assert_allclose(np.asarray(td), np.asarray(ts), atol=5e-3)
    np.testing.assert_allclose(np.asarray(xd), np.asarray(xs), atol=2e-2)
    # costs agree to a few percent
    assert abs(float(info_d["cost"]) - float(info_s["cost"])) < 0.05 * float(info_s["cost"]) + 1e-3


def test_dense_ba_with_depth(rng):
    from mpsfm_tpu.ba.dense import densify, solve_ba_dense

    rec, gt = make_synthetic_rec(rng, noise_px=0.3, pose_noise=0.0)
    from __graft_entry__ import _synthetic_ba_data

    data = _synthetic_ba_data(n_cams=8, n_pts=256)
    qs, ts, xs, info_s = solve_ba(data, max_iters=20)
    ddata = densify(data, 8, 256)
    qd, td, xd, info_d = solve_ba_dense(ddata, max_iters=20)
    assert float(info_d["cost"]) < float(info_d["cost0"])
    assert abs(float(info_d["cost"]) - float(info_s["cost"])) < 0.05 * float(info_s["cost"]) + 1e-3


def test_pallas_cholesky_solve_interpret(rng):
    """Fused Pallas Cholesky matches a dense solve (interpret mode)."""
    import jax.numpy as jnp

    from mpsfm_tpu.ba.pallas_cholesky import cholesky_solve

    for K in (32, 192):
        A = rng.normal(size=(K, K)).astype(np.float32)
        S = A @ A.T + K * np.eye(K, dtype=np.float32)
        b = rng.normal(size=(K,)).astype(np.float32)
        x = np.asarray(cholesky_solve(jnp.asarray(S), jnp.asarray(b), interpret=True))
        np.testing.assert_allclose(x, np.linalg.solve(S, b), atol=1e-4)


def test_block_schur_explicit_matches_matrix_free(rng):
    """Explicit block-sparse Schur (ba/schur_sparse.py): the explicit
    operator equals the matrix-free S·x, and the full LM solve reaches
    the same optimum as the matrix-free path (Ceres SPARSE_SCHUR analog,
    reference bundle_adjustment.py:285-293)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_ba_data_sparse
    from mpsfm_tpu.ba import losses
    from mpsfm_tpu.ba.schur_sparse import (
        block_schur_matvec,
        build_schur_blocks,
        pm_backsub,
        pm_coupling_table,
        pm_reduced_rhs,
    )
    from mpsfm_tpu.ba.solver import _assemble_ne, _cam_broadcast_rows, inv3x3

    data = _synthetic_ba_data_sparse(n_cams=12, n_pts=512, track_len=4)
    bs = data.bs
    assert bs is not None
    C = 12
    ne = jax.jit(
        lambda d: _assemble_ne(d, d.quat, d.t, d.xyz, losses.SOFT_L1, losses.CAUCHY)
    )(data)
    Hcc, Hpp, g_c, g_p, Wr_rows, Wd_rows, _T = ne
    No, Nd = Wr_rows.shape[0], Wd_rows.shape[0]
    lam = 3e-3
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    dp = jnp.einsum("pii->pi", Hpp)
    Hpp_inv = jax.jit(inv3x3)(Hpp + jnp.einsum("pi,ij->pij", lam * dp + 1e-8, eye3) * eye3)
    dc = jnp.einsum("cii->ci", Hcc)
    Hcc_aug = Hcc + jnp.einsum("ci,ij->cij", lam * dc + 1e-8 + (1 - data.cam_dof), eye6) * eye6

    Vpm = jax.jit(pm_coupling_table)(Wr_rows, Wd_rows, bs)
    G = jax.jit(build_schur_blocks)(Vpm, Hpp_inv, bs)
    Wr = Wr_rows.reshape(No, 6, 3)
    Wd = Wd_rows.reshape(Nd, 6, 3)

    def S_mv_free(x):
        y_r = (Wr * _cam_broadcast_rows(x, No)[:, :, None]).sum(1)
        y_d = (Wd * _cam_broadcast_rows(x, Nd)[:, :, None]).sum(1)
        yp = (y_r[data.r_pt_slots] * data.r_pt_slot_mask[..., None]).sum(1)
        yp = yp + (y_d[data.d_pt_slots] * data.d_pt_slot_mask[..., None]).sum(1)
        zp = jnp.einsum("pij,pj->pi", Hpp_inv, yp)
        back_r = (Wr * zp[data.r_pt][:, None, :]).sum(-1)
        back_d = (Wd * zp[data.d_pt][:, None, :]).sum(-1)
        back = back_r.reshape(C, -1, 6).sum(1) + back_d.reshape(C, -1, 6).sum(1)
        return jnp.einsum("cij,cj->ci", Hcc_aug, x) - back

    x = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
    y_free = np.asarray(jax.jit(S_mv_free)(x))
    y_exp = np.asarray(jax.jit(lambda x: block_schur_matvec(G, bs, Hcc_aug, x))(x))
    # bf16 pair products: ~1% relative agreement is the expected scale
    assert np.abs(y_exp - y_free).max() <= 2e-2 * np.abs(y_free).max() + 1e-4

    # rhs + backsub parity vs the observation-table formulation
    rhs_pm, hp = jax.jit(lambda: pm_reduced_rhs(Vpm, Hpp_inv, g_c, g_p, bs))()
    hp2 = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)
    red_r = (Wr * hp2[data.r_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
    red_d = (Wd * hp2[data.d_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
    rhs_ref = -(g_c - red_r - red_d)
    a, b = np.asarray(rhs_pm), np.asarray(rhs_ref)
    assert np.abs(a - b).max() <= 1e-5 * np.abs(b).max() + 1e-3

    dc_step = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32) * 1e-3)
    dp_pm = np.asarray(jax.jit(
        lambda: pm_backsub(Vpm, Hpp_inv, g_p, dc_step, data.point_var, bs)
    )())
    wtd_r = (Wr * _cam_broadcast_rows(dc_step, No)[:, :, None]).sum(1)
    wtd_d = (Wd * _cam_broadcast_rows(dc_step, Nd)[:, :, None]).sum(1)
    wtd = (wtd_r[data.r_pt_slots] * data.r_pt_slot_mask[..., None]).sum(1)
    wtd = wtd + (wtd_d[data.d_pt_slots] * data.d_pt_slot_mask[..., None]).sum(1)
    dp_ref = np.asarray(
        -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + wtd) * data.point_var[:, None]
    )
    assert np.abs(dp_pm - dp_ref).max() <= 1e-5 * np.abs(dp_ref).max() + 1e-5


@pytest.mark.slow
def test_block_schur_full_solve_parity(rng):
    """Full LM solve via the explicit path reaches the matrix-free
    optimum (same final cost within fp noise)."""
    from __graft_entry__ import _synthetic_ba_data_sparse
    from mpsfm_tpu.ba.solver import solve_ba

    d_bs = _synthetic_ba_data_sparse(n_cams=16, n_pts=1024, track_len=4, seed=1)
    assert d_bs.bs is not None
    d_mf = d_bs._replace(bs=None)
    _q1, _t1, _x1, i1 = solve_ba(d_bs, max_iters=10)
    _q2, _t2, _x2, i2 = solve_ba(d_mf, max_iters=10)
    c1, c2 = float(i1["cost"]), float(i2["cost"])
    assert c1 < float(i1["cost0"]) * 0.1
    assert abs(c1 - c2) < 0.02 * c2 + 1e-3
