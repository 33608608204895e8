import numpy as np

from mpsfm_tpu.scene.corrgraph import CorrespondenceGraph
from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Pose, Reconstruction


def build_rec(n_images=4, n_kps=50):
    rec = Reconstruction()
    cam = HostCamera(1, np.array([500.0, 500.0, 320.0, 240.0]), 640, 480)
    rec.add_camera(cam)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        im = ImageRecord(i, f"im{i}.jpg", 1)
        im.keypoints = rng.uniform(0, 600, size=(n_kps, 2))
        im.point3D_ids = np.full(n_kps, -1, np.int64)
        im.pose = Pose(np.array([1.0, 0, 0, 0]), np.array([0.5 * i, 0.0, 0.0]))
        im.registered = True
        rec.add_image(im)
    return rec


def test_point_pool_add_delete():
    rec = build_rec()
    pid = rec.add_point3D(np.array([0.0, 0, 5.0]), [(0, 0), (1, 0), (2, 0)])
    assert rec.alive[pid]
    assert rec.track_len[pid] == 3
    assert rec.images[0].point3D_ids[0] == pid
    # add obs then remove until auto-delete
    rec.add_observation(pid, 3, 0)
    assert rec.track_len[pid] == 4
    rec.remove_observation(pid, 3, 0)
    rec.remove_observation(pid, 0, 0)
    assert rec.alive[pid]
    rec.remove_observation(pid, 1, 0)  # track drops below 2 -> delete
    assert not rec.alive[pid]
    assert (rec.images[2].point3D_ids == -1).all()


def test_pool_growth_and_reuse():
    rec = build_rec(n_images=2, n_kps=3000)
    pids = []
    for k in range(2500):
        pid = rec.add_point3D(np.array([0.0, 0, 5.0]), [(0, k), (1, k)])
        pids.append(pid)
    assert rec.num_points3D() == 2500
    rec.delete_point3D(pids[0])
    pid2 = rec.add_point3D(np.array([1.0, 0, 5.0]), [(0, 0), (1, 0)])
    assert pid2 == pids[0]  # slot reuse


def test_add_point_skips_taken_observations():
    rec = build_rec()
    p1 = rec.add_point3D(np.array([0.0, 0, 5.0]), [(0, 0), (1, 0)])
    p2 = rec.add_point3D(np.array([0.0, 0, 6.0]), [(0, 0), (1, 1), (2, 1)])
    assert rec.images[0].point3D_ids[0] == p1
    assert rec.track_len[p2] == 2


def test_projection_and_filters():
    rec = build_rec()
    # true point at z=5 in front of all cameras
    xyz = np.array([0.3, 0.2, 5.0])
    track = []
    for imid in range(4):
        im = rec.images[imid]
        p_cam = im.pose.transform(xyz[None])[0]
        px = rec.cameras[1].img_from_cam(p_cam[:2] / p_cam[2])
        im.keypoints[imid] = px  # use kp idx == imid
        track.append((imid, imid))
    pid = rec.add_point3D(xyz, track)
    (o_pid, o_im, o_kp), err = rec._point_reproj_errors([pid])
    assert len(err) == 4 and err.max() < 1e-12
    # corrupt one observation -> filtered
    rec.images[3].keypoints[3] += 50.0
    changed = rec.filter_points3D(4.0, 0.001, [pid])
    assert changed == 1
    assert rec.track_len[pid] == 3
    # angle filter: cameras span 1.5 units at z=5 -> ~17deg; min_angle=30 kills it
    changed = rec.filter_points3D(4.0, 30.0, [pid])
    assert not rec.alive[pid]


def test_negative_depth_filter():
    rec = build_rec()
    pid = rec.add_point3D(np.array([0.0, 0.0, -5.0]), [(0, 0), (1, 0), (2, 0)])
    n = rec.filter_observations_with_negative_depth()
    assert n >= 2
    assert not rec.alive[pid]


def test_deregister_image():
    rec = build_rec()
    p1 = rec.add_point3D(np.array([0, 0, 5.0]), [(0, 0), (1, 0), (2, 0)])
    p2 = rec.add_point3D(np.array([0, 0, 6.0]), [(0, 1), (1, 1)])
    rec.deregister_image(1)
    assert not rec.images[1].registered
    assert rec.track_len[p1] == 2 and rec.alive[p1]
    assert not rec.alive[p2]  # track fell below 2


def test_local_bundle_ranking():
    rec = build_rec()
    # im0-im1 share 3 points; im0-im2 share 1
    for k in range(3):
        rec.add_point3D(np.array([0, 0, 5.0 + k]), [(0, k), (1, k)])
    rec.add_point3D(np.array([0, 0, 9.0]), [(0, 3), (2, 3)])
    ids = rec.find_local_bundle_ids(0)
    assert ids[0] == 1 and 2 in ids
    assert 3 not in ids


def test_normalize():
    rec = build_rec()
    for k in range(10):
        rec.add_point3D(np.array([k * 1.0, 0, 5.0]), [(0, k), (1, k)])
    before_px, _ = rec.project_points_into_image(0, rec.point_ids())
    scale = rec.normalize(False, 5, 0.2, 0.8)
    after_px, _ = rec.project_points_into_image(0, rec.point_ids())
    # similarity transform preserves projections
    np.testing.assert_allclose(before_px, after_px, atol=1e-8)


def test_corrgraph_adjacency():
    cg = CorrespondenceGraph()
    cg.add_image(0, 10)
    cg.add_image(1, 10)
    cg.add_image(2, 10)
    cg.add_correspondences(0, 1, np.array([[0, 5], [1, 6]]))
    cg.add_correspondences(2, 0, np.array([[3, 0]]))  # reversed order pair
    cg.finalize()
    assert cg.num_correspondences_between_images(0, 1) == 2
    assert cg.num_correspondences_between_images(1, 0) == 2
    m = cg.matches(1, 0)
    assert set(map(tuple, m.tolist())) == {(5, 0), (6, 1)}
    oim, okp = cg.correspondences(0, 0)
    assert set(zip(oim.tolist(), okp.tolist())) == {(1, 5), (2, 3)}
    assert cg.num_correspondences_for_image(0) == 3


def test_corrgraph_dedup_on_repeat_add():
    cg = CorrespondenceGraph()
    cg.add_image(0, 5)
    cg.add_image(1, 5)
    cg.add_correspondences(0, 1, np.array([[0, 1]]))
    cg.add_correspondences(0, 1, np.array([[0, 1], [2, 3]]))
    assert cg.num_correspondences_between_images(0, 1) == 2


def test_find_local_bundle_prefers_triangulation_angle():
    """COLMAP FindLocalBundle ladder: with equal covisibility, an image with
    good triangulation angles to the ref must be selected over a near-zero-
    baseline one (reference scene/reconstruction/base.py:147-156)."""
    rec = Reconstruction()
    cam = HostCamera(1, np.array([500.0, 500.0, 320.0, 240.0]), 640, 480)
    rec.add_camera(cam)
    n_kps = 40
    # im0 = ref at origin; im1 almost coincident (tiny baseline -> ~0 angle);
    # im2/im3 well-separated (wide angle)
    centers = [0.0, 1e-4, 2.0, 3.0]
    for i, cx in enumerate(centers):
        im = ImageRecord(i, f"im{i}.jpg", 1)
        im.keypoints = np.tile(np.array([[320.0, 240.0]]), (n_kps, 1))
        im.point3D_ids = np.full(n_kps, -1, np.int64)
        im.pose = Pose(np.array([1.0, 0, 0, 0]), np.array([-cx, 0.0, 0.0]))
        im.registered = True
        rec.add_image(im)
    rng = np.random.default_rng(3)
    for k in range(n_kps):
        xyz = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 8.0 + rng.uniform(0, 2)])
        rec.add_point3D(xyz, [(0, k), (1, k), (2, k), (3, k)])
    # all three candidates share all 40 points with im0; only im2/im3 have
    # usable angles, so a 2-image bundle must pick them, not im1
    sel = rec.find_local_bundle_ids(0, num_images=2)
    assert set(sel) == {2, 3}
    # with 3 slots the low-parallax image still gets filled in at the end
    sel3 = rec.find_local_bundle_ids(0, num_images=3)
    assert set(sel3) == {1, 2, 3}
