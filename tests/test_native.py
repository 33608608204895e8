"""Native track store: build, parity with the Python pool, and speed."""

import numpy as np
import pytest

from mpsfm_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build unavailable")


def test_native_trackstore_basic():
    ts = native.NativeTrackStore()
    ts.add_image(0, 10)
    ts.add_image(1, 10)
    ts.add_image(2, 10)
    pid = ts.add_point([0.0, 0, 5.0], [(0, 0), (1, 0), (2, 0)])
    assert pid == 0
    assert ts.alive(pid)
    assert ts.track_len(pid) == 3
    np.testing.assert_allclose(ts.get_xyz(pid), [0, 0, 5])
    assert ts.image_point_ids(0, 10)[0] == pid
    # duplicate observation skipped
    p2 = ts.add_point([1.0, 0, 6.0], [(0, 0), (1, 1)])
    assert ts.track_len(p2) == 1  # (0,0) already taken... falls below 2 on removal rules
    ts.add_observation(p2, 2, 1)
    assert ts.track_len(p2) == 2
    # removal to auto-delete
    deleted = ts.remove_observation(pid, 0, 0)
    assert not deleted
    deleted = ts.remove_observation(pid, 1, 0)
    assert deleted  # fell below 2
    assert not ts.alive(pid)
    assert (ts.image_point_ids(2, 10) != pid).all()
    # slot reuse
    p3 = ts.add_point([2.0, 0, 7.0], [(0, 5), (1, 5)])
    assert p3 == pid


def test_native_trackstore_matches_python_pool(rng):
    from mpsfm_tpu.scene.reconstruction import HostCamera, ImageRecord, Reconstruction

    rec = Reconstruction()
    rec.add_camera(HostCamera(1, np.array([500.0, 500, 320, 240]), 640, 480))
    ts = native.NativeTrackStore()
    n_im, n_kp = 6, 200
    for i in range(n_im):
        im = ImageRecord(i, f"im{i}", 1)
        im.keypoints = np.zeros((n_kp, 2))
        im.point3D_ids = np.full(n_kp, -1, np.int64)
        rec.add_image(im)
        ts.add_image(i, n_kp)

    # random add/remove/delete storm, mirrored on both stores
    pids = []
    for step in range(500):
        op = rng.integers(0, 4)
        if op <= 1 or not pids:  # add point
            k = int(rng.integers(0, n_kp))
            track = [(i, k) for i in range(n_im) if rng.uniform() < 0.7]
            if len(track) < 2:
                continue
            xyz = rng.normal(size=3)
            p_py = rec.add_point3D(xyz, track)
            p_nat = ts.add_point(xyz, track)
            assert (p_py == -1) == (p_nat == -1)
            if p_py >= 0:
                assert p_py == p_nat
                pids.append(p_py)
        elif op == 2:  # remove an observation
            pid = pids[rng.integers(0, len(pids))]
            if not rec.alive[pid]:
                continue
            tr = rec.tracks[pid]
            imid, kp = tr[rng.integers(0, len(tr))]
            rec.remove_observation(pid, imid, kp)
            ts.remove_observation(pid, imid, kp)
        else:  # delete a point
            pid = pids[rng.integers(0, len(pids))]
            if not rec.alive[pid]:
                continue
            rec.delete_point3D(pid)
            ts.delete_point(pid)

    assert rec.num_points3D() == ts.num_points()
    np.testing.assert_array_equal(np.sort(rec.point_ids()), np.sort(ts.alive_pids()))
    for i in range(n_im):
        np.testing.assert_array_equal(rec.images[i].point3D_ids, ts.image_point_ids(i, n_kp))
    for pid in ts.alive_pids():
        assert sorted(ts.get_track(int(pid))) == sorted(rec.tracks[pid])
        assert ts.track_len(int(pid)) == rec.track_len[pid]
    # flat observations parity
    o1 = rec.observations(rec.point_ids())
    o2 = ts.observations(ts.alive_pids())
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(a, b)
