import numpy as np
import pytest

from mpsfm_tpu.mapper.depth_consistency import DepthConsistencyChecker
from mpsfm_tpu.mapper.triangulator import Triangulator
from mpsfm_tpu.scene.corrgraph import CorrespondenceGraph
from mpsfm_tpu.utils.colmap_io import read_text, write_text

from synthetic import PlaneScene
from test_ba import make_synthetic_rec


def test_triangulator_creates_and_completes(rng):
    rec, gt = make_synthetic_rec(rng, n_cams=4, n_pts=60, noise_px=0.3, pose_noise=0.0)
    # wipe points, keep keypoints; build a corr graph from GT identity
    for pid in list(rec.point_ids()):
        rec.delete_point3D(int(pid))
    cg = CorrespondenceGraph()
    for i in range(4):
        cg.add_image(i, 60)
    for i in range(4):
        for j in range(i + 1, 4):
            m = np.stack([np.arange(60)] * 2, -1)
            cg.add_correspondences(i, j, m)
    cg.finalize()
    tri = Triangulator({"min_angle": 0.5}, rec, cg)
    tri.triangulate_image(0)
    n1 = rec.num_points3D()
    assert n1 > 40
    # tracks should span all registered images via the correspondences
    lens = rec.track_len[rec.point_ids()]
    assert lens.mean() > 3.0
    kp_of = np.array([rec.tracks[p][0][1] for p in rec.point_ids()])
    err = np.linalg.norm(rec.xyz[rec.point_ids()] - gt["pts"][kp_of], axis=1)
    assert np.median(err) < 0.05

    # merge/complete are no-ops on a consistent reconstruction
    assert tri.complete_and_merge_all_tracks() == 0


def test_triangulator_lift_low_parallax(rng):
    rec, gt = make_synthetic_rec(rng, n_cams=2, n_pts=40, noise_px=0.0, pose_noise=0.0)
    # small baseline => points create at <1.5 deg parallax and get lifted
    rec.images[1].pose = rec.images[0].pose.copy()
    rec.images[1].pose.t = rec.images[1].pose.t + np.array([0.02, 0, 0])
    cam = rec.cameras[1]
    p_cam = rec.images[1].pose.transform(gt["pts"])
    rec.images[1].keypoints = cam.img_from_cam(p_cam[:, :2] / p_cam[:, 2:3])
    for pid in list(rec.point_ids()):
        rec.delete_point3D(int(pid))
    cg = CorrespondenceGraph()
    cg.add_image(0, 40)
    cg.add_image(1, 40)
    cg.add_correspondences(0, 1, np.stack([np.arange(40)] * 2, -1))
    cg.finalize()

    class D:
        activated = True

        def __init__(self, rec):
            self.rec = rec

        def valid_at_kps(self, xy):
            return np.ones(len(xy), bool)

        def data_at_kps(self, xy):
            # true depth of the GT point nearest to the kp
            cam = self.rec.camera(0)
            xyn = cam.cam_from_img(xy)
            d = []
            for p in gt["pts"]:
                pass
            # all points at their GT depth via lookup by kp identity:
            return np.array([5.0] * len(xy))

    # depth-lifting needs plausible depth; use GT z of each kp index
    class D2(D):
        def __init__(self, rec, imid):
            super().__init__(rec)
            self.imid = imid

        def data_at_kps(self, xy):
            im = self.rec.images[self.imid]
            idx = [int(np.argmin(np.linalg.norm(im.keypoints - p, axis=1))) for p in xy]
            p_cam = self.rec.images[self.imid].pose.transform(gt["pts"][idx])
            return p_cam[:, 2]

    rec.images[0].depth = D2(rec, 0)
    rec.images[1].depth = D2(rec, 1)
    tri = Triangulator({}, rec, cg)
    tri.triangulate_image(0)
    assert rec.num_points3D() > 20
    # lifted points should sit near GT
    kp_of = np.array([rec.tracks[p][0][1] for p in rec.point_ids()])
    err = np.linalg.norm(rec.xyz[rec.point_ids()] - gt["pts"][kp_of], axis=1)
    assert np.median(err) < 0.05


def make_dc_rec(rng, shift=0.0):
    """Two views of the analytic plane with exact depth maps (+optional
    corruption of view 2's depth)."""
    scene = PlaneScene(rng=rng, n_images=2, n_points=10, img_wh=(64, 48), focal=60.0)
    # exact-depth premise: no per-image scale corruption (the DC tests
    # manipulate pose/shift themselves)
    rec, kps, matches, gt = scene.build(with_priors=True, depth_scale_err_range=(1.0, 1.0))
    for i in (0, 1):
        rec.images[i].registered = True
        rec.images[i].pose = gt["poses"][i]
    if shift:
        d = rec.images[1].depth
        d.data_prior = d.data_prior + shift
    return rec


def test_depth_consistency_accepts_consistent(rng):
    rec = make_dc_rec(rng)
    dc = DepthConsistencyChecker({}, rec)
    score = dc.check_bundle_depth_consistency(0, {"optim_ids": {0, 1}})
    assert score < 0.15, score


def test_depth_consistency_rejects_corrupted(rng):
    rec = make_dc_rec(rng, shift=1.5)  # gross depth offset in view 2
    dc = DepthConsistencyChecker({}, rec)
    score = dc.check_bundle_depth_consistency(0, {"optim_ids": {0, 1}})
    assert score > 0.15, score


def test_dc_bundle_batched_matches_perpair(rng):
    """The fused batched bundle program must reproduce the legacy per-pair
    reproject/z-buffer/whiten/classify chain (modulo f32 boundary pixels)."""
    rec = make_dc_rec(rng, shift=0.3)
    dc = DepthConsistencyChecker({}, rec)
    score = dc.check_bundle_depth_consistency(0, {"optim_ids": {0, 1}})
    out = dc.check_depth_consistency(0, 1)
    ref_nv = int((~out["valid2"] & out["valid2_mask"]).sum())
    ref_v = int((out["valid2_mask"] & ~out["occl2"]).sum())
    qry_nv = int((~out["valid1"] & out["valid1_mask"]).sum())
    qry_v = int((out["valid1_mask"] & ~out["occl1"]).sum())
    legacy = max(ref_nv / max(ref_v, 0.1), qry_nv / max(qry_v, 0.1))
    assert score == pytest.approx(legacy, abs=0.02), (score, legacy)


def test_dc_relax_ladder(rng):
    rec = make_dc_rec(rng)
    dc = DepthConsistencyChecker({}, rec)
    t0 = dc.depth_cons_thresh
    dc.relax_thresholds()
    assert dc.depth_cons_thresh == pytest.approx(t0 * 1.3)
    assert dc.cons_thresh_times_increased == 1
    dc.at_registration_success()
    assert dc.depth_cons_thresh == t0
    assert dc.cons_thresh_times_increased == 0


def test_colmap_io_roundtrip(tmp_path, rng):
    rec, gt = make_synthetic_rec(rng, n_cams=3, n_pts=30, noise_px=0.0, pose_noise=0.0)
    write_text(rec, tmp_path)
    rec2 = read_text(tmp_path)
    assert len(rec2.registered_images) == 3
    for i in range(3):
        np.testing.assert_allclose(rec2.images[i].pose.q, rec.images[i].pose.q, atol=1e-9)
        np.testing.assert_allclose(rec2.images[i].pose.t, rec.images[i].pose.t, atol=1e-9)
    assert rec2.cameras[1].fx == rec.cameras[1].fx


def test_colmap_binary_roundtrip(tmp_path, rng):
    """COLMAP *binary* model write/read (VERDICT r4 item 4a): byte-level
    round-trip — text and binary writers must agree, and re-writing the
    read-back reconstruction must reproduce identical bytes."""
    from mpsfm_tpu.utils.colmap_io import read_binary, write_binary

    rec, gt = make_synthetic_rec(rng, n_cams=3, n_pts=30, noise_px=0.0, pose_noise=0.0)
    d1 = tmp_path / "a"
    write_binary(rec, d1)
    rec2 = read_binary(d1)
    assert len(rec2.registered_images) == 3
    for i in range(3):
        np.testing.assert_allclose(rec2.images[i].pose.q, rec.images[i].pose.q, atol=1e-12)
        np.testing.assert_allclose(rec2.images[i].pose.t, rec.images[i].pose.t, atol=1e-12)
        assert rec2.images[i].name == rec.images[i].name
    assert rec2.cameras[1].fx == rec.cameras[1].fx
    # point set + tracks survive (ids may be renumbered densely)
    xyz1 = np.sort(np.asarray([rec.xyz[p] for p in rec.point_ids()]), axis=0)
    xyz2 = np.sort(np.asarray([rec2.xyz[p] for p in rec2.point_ids()]), axis=0)
    np.testing.assert_allclose(xyz2, xyz1, atol=1e-12)
    assert sum(len(rec2.tracks[p]) for p in rec2.point_ids()) == sum(
        len(rec.tracks[p]) for p in rec.point_ids()
    )
    # byte-level: write(read(write(rec))) == write(rec)
    d2 = tmp_path / "b"
    write_binary(rec2, d2)
    for name in ("cameras.bin", "images.bin", "points3D.bin"):
        assert (d2 / name).read_bytes() == (d1 / name).read_bytes(), name
    # text and binary writers agree on poses (parse text back)
    write_text(rec, d1)
    rec3 = read_text(d1)
    for i in range(3):
        np.testing.assert_allclose(rec3.images[i].pose.q, rec2.images[i].pose.q, atol=1e-9)


def test_dc_pre_fail_logic(rng):
    """pre_fail skips candidates whose previous DC score exceeds the
    threshold (reference base.py:364-366 + the documented intent of the
    unfinished depthconsistency.py:169-192)."""
    rec = make_dc_rec(rng)
    dc = DepthConsistencyChecker({}, rec)
    im = rec.images[1]
    # no previous score: never pre-fail
    assert not dc.pre_fail(1)
    im.last_dc_score = 0.5  # above default 0.15 threshold
    assert dc.pre_fail(1)
    assert dc.reg_batch_dc_times_failed == 1
    # resampling enabled but not yet tried: give it a chance
    dc2 = DepthConsistencyChecker({"depth_consistency_resample": True}, rec)
    im.dc_times_inliers_resampled = 0
    assert not dc2.pre_fail(1)
    im.dc_times_inliers_resampled = 1
    assert dc2.pre_fail(1)
    # forced-registration mode disables it
    dc2.skip_dc_check = True
    assert not dc2.pre_fail(1)
    # below threshold passes
    im.last_dc_score = 0.05
    dc2.skip_dc_check = False
    assert not dc2.pre_fail(1)


def test_dc_resample_blacklists_ap_inliers(rng):
    """at_failure with depth_consistency_resample accumulates the last AP
    inlier masks into ignore_matches_AP (reference :195-211)."""
    import numpy as np

    rec = make_dc_rec(rng)
    dc = DepthConsistencyChecker({"depth_consistency_resample": True}, rec)
    m0 = np.array([True, False, True, False])
    rec.last_ap_inlier_masks = {0: m0}
    dc.at_failure(1)
    im = rec.images[1]
    assert im.dc_times_inliers_resampled == 1
    np.testing.assert_array_equal(im.ignore_matches_AP[0], m0)
    # second failure on the surviving (unignored) positions
    m1 = np.array([True, False])  # over the 2 surviving match slots
    rec.last_ap_inlier_masks = {0: m1}
    dc.at_failure(1)
    np.testing.assert_array_equal(im.ignore_matches_AP[0], np.array([True, True, True, False]))
    assert dc.reg_batch_dc_times_failed == 2


def test_p3p_small_pnp_exact_recovery():
    """Exhaustive-P3P small-count PnP (below the 6-pt DLT sample) recovers
    an exact synthetic pose from 4-5 points (COLMAP P3P parity path)."""
    from mpsfm_tpu.mapper.registration import run_pnp_small

    rng = np.random.default_rng(3)
    for n in (4, 5):
        w = rng.normal(scale=0.3, size=3)
        from mpsfm_tpu.mapper.registration import _rodrigues_np

        R_gt = _rodrigues_np(w)
        t_gt = np.array([0.2, -0.1, 0.3])
        X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 6.0])
        Pc = X @ R_gt.T + t_gt
        assert (Pc[:, 2] > 0).all()
        xyn = Pc[:, :2] / Pc[:, 2:]
        out = run_pnp_small(X, xyn, 1e-8)
        assert out["num_inliers"] == n
        Pc2 = X @ out["pose"].rotation_matrix().T + out["pose"].t
        np.testing.assert_allclose(Pc2[:, :2] / Pc2[:, 2:], xyn, atol=1e-6)


def test_p3p_small_pnp_with_outlier():
    from mpsfm_tpu.mapper.registration import run_pnp_small

    rng = np.random.default_rng(5)
    R_gt = np.eye(3)
    t_gt = np.array([0.0, 0.0, 0.2])
    X = rng.uniform(-1, 1, (5, 3)) + np.array([0, 0, 5.0])
    Pc = X @ R_gt.T + t_gt
    xyn = Pc[:, :2] / Pc[:, 2:]
    xyn[4] += 0.1  # gross outlier
    out = run_pnp_small(X, xyn, 1e-6)
    assert out["num_inliers"] == 4
    assert not out["inlier_mask"][4]
