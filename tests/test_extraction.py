import numpy as np
import pytest

from mpsfm_tpu.extraction.features.classical import ClassicalFeatures
from mpsfm_tpu.extraction.features.superpoint import SuperPoint
from mpsfm_tpu.extraction.matchers.lightglue import LightGlue
from mpsfm_tpu.extraction.matchers.nn import MutualNNMatcher
from mpsfm_tpu.extraction.pairs import pairs_exhaustive, pairs_from_retrieval, pairs_sequential
from mpsfm_tpu.extraction.priors import MeasuredDepthBackend, normals_from_depth
from mpsfm_tpu.utils import io


def checkerboard(H=120, W=160, sq=16):
    img = np.zeros((H, W), np.float32)
    for i in range(0, H, sq):
        for j in range(0, W, sq):
            if ((i // sq) + (j // sq)) % 2 == 0:
                img[i : i + sq, j : j + sq] = 1.0
    return img


def test_classical_features_find_corners():
    img = checkerboard()
    feats = ClassicalFeatures({"max_keypoints": 256})(img)
    kps = feats["keypoints"]
    assert len(kps) > 20
    # corners of the checkerboard lie at multiples of sq
    snapped = np.round(kps / 16) * 16
    dist = np.abs(kps - snapped).max(axis=1)
    assert (dist < 3).mean() > 0.7
    assert np.isfinite(feats["descriptors"]).all()
    # descriptors are unit-normalized
    norms = np.linalg.norm(feats["descriptors"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_classical_features_translation_matching(rng):
    base = rng.uniform(0, 1, (40, 50)).astype(np.float32)
    import cv2

    img1 = cv2.resize(base, (200, 160), interpolation=cv2.INTER_CUBIC)
    shift = 12
    img2 = np.roll(img1, shift, axis=1)
    f1 = ClassicalFeatures({"max_keypoints": 512})(img1)
    f2 = ClassicalFeatures({"max_keypoints": 512})(img2)
    out = MutualNNMatcher()(f1["descriptors"], f2["descriptors"])
    m = out["matches0"]
    matched = np.where(m >= 0)[0]
    assert len(matched) > 30
    d = f2["keypoints"][m[matched]] - f1["keypoints"][matched]
    # majority should be the pure translation
    good = (np.abs(d[:, 0] - shift) < 2) & (np.abs(d[:, 1]) < 2)
    assert good.mean() > 0.6


def test_mutual_nn_identity(rng):
    d = rng.normal(size=(100, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    out = MutualNNMatcher({"ratio_threshold": 0.0})(d, d)
    np.testing.assert_array_equal(out["matches0"], np.arange(100))


@pytest.mark.slow
def test_superpoint_random_weights_smoke():
    sp = SuperPoint({"max_keypoints": 128, "detection_threshold": -1.0})
    sp.init_random()
    out = sp(np.random.default_rng(0).uniform(0, 1, (96, 128)).astype(np.float32))
    assert out["keypoints"].shape[1] == 2
    assert out["descriptors"].shape[1] == 256
    assert (out["keypoints"][:, 0] < 128).all() and (out["keypoints"][:, 1] < 96).all()


def test_lightglue_random_weights_smoke(rng):
    lg = LightGlue({"n_layers": 2, "filter_threshold": 0.0})
    lg.init_random()
    k0 = rng.uniform(0, 100, (40, 2)).astype(np.float32)
    k1 = rng.uniform(0, 100, (55, 2)).astype(np.float32)
    d0 = rng.normal(size=(40, 256)).astype(np.float32)
    d1 = rng.normal(size=(55, 256)).astype(np.float32)
    out = lg(k0, d0, (100, 100), k1, d1, (100, 100))
    assert out["matches0"].shape == (40,)
    assert ((out["matches0"] >= -1) & (out["matches0"] < 55)).all()


def test_pairs_generators():
    names = [f"im{i}" for i in range(6)]
    assert len(pairs_exhaustive(names)) == 15
    seq = pairs_sequential(names, overlap=2)
    assert ("im0", "im1") in seq and ("im0", "im2") in seq
    rng = np.random.default_rng(0)
    descs = rng.normal(size=(6, 32))
    descs[1] = descs[0] + 0.01  # most similar pair
    pr = pairs_from_retrieval(names, descs, num_matched=2)
    assert ("im0", "im1") in pr


def test_normals_from_depth_plane():
    H, W, f = 60, 80, 100.0
    n = np.array([0.3, -0.2, -1.0])
    n /= np.linalg.norm(n)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    u = (xx - W / 2) / f
    v = (yy - H / 2) / f
    depth = n[2] * 5.0 / (n[0] * u + n[1] * v + n[2])
    est = normals_from_depth(depth, f, f, W / 2, H / 2)
    inner = np.abs(np.einsum("hwi,i->hw", est, n))[5:-5, 5:-5]
    assert inner.mean() > 0.99


def test_measured_backend():
    d = np.full((40, 50), 3.0)
    d[0, 0] = 0  # invalid
    out = MeasuredDepthBackend()(None, depth_measured=d, intrinsics=(100, 100, 25, 20))
    assert out["depth_variance"][5, 5] == pytest.approx((0.03) ** 2)
    assert not out["valid"][0, 0]
    assert "normals" in out


def test_h5_io_roundtrip(tmp_path):
    feats = tmp_path / "feats.h5"
    kps = np.random.default_rng(0).uniform(0, 100, (50, 2))
    desc = np.random.default_rng(0).normal(size=(50, 64)).astype(np.float32)
    io.write_features(feats, "a.jpg", kps, desc, uncertainty=1.5)
    k2, unc = io.get_keypoints(feats, "a.jpg", return_uncertainty=True)
    np.testing.assert_allclose(k2, kps, atol=0.05)  # f16 storage
    assert unc == 1.5
    matches0 = np.array([2, -1, 0])
    io.write_matches(tmp_path / "m.h5", "a.jpg", "b.jpg", matches0, [0.9, 0.0, 0.5])
    m, s = io.get_matches(tmp_path / "m.h5", "a.jpg", "b.jpg")
    assert m.tolist() == [[0, 2], [2, 0]]
    # reversed lookup
    m2, _ = io.get_matches(tmp_path / "m.h5", "b.jpg", "a.jpg")
    assert m2.tolist() == [[2, 0], [0, 2]]
    io.write_mono_map(tmp_path / "d.h5", "a.jpg", {"depth": np.ones((4, 5))})
    assert io.get_mono_map(tmp_path / "d.h5", "a.jpg")["depth"].shape == (4, 5)
    io.write_pairs(tmp_path / "p.txt", [("a", "b"), ("b", "c")])
    assert io.read_pairs(tmp_path / "p.txt") == [("a", "b"), ("b", "c")]


def test_pair_mono_map_best_selection(tmp_path):
    import numpy as np

    d = np.ones((6, 8))
    good = {"depth": d, "valid": np.ones_like(d, bool), "variance": d * 0.01}
    bad = {"depth": d * 2, "valid": np.ones_like(d, bool), "variance": d * 1.0}
    io.write_pair_mono_map(tmp_path / "pd.h5", "a.jpg", "b.jpg", {"a.jpg": bad})
    io.write_pair_mono_map(tmp_path / "pd.h5", "a.jpg", "c.jpg", {"a.jpg": good})
    out = io.get_mono_map_from_pairs(
        tmp_path / "pd.h5", "a.jpg", [("a.jpg", "b.jpg"), ("a.jpg", "c.jpg")]
    )
    assert out["depth"][0, 0] == 1.0  # picked the low-variance pair
    assert io.get_mono_map_from_pairs(tmp_path / "pd.h5", "zzz.jpg", [("a.jpg", "b.jpg")]) is None


def test_match_cache_skips_existing_pairs(tmp_path):
    """Cached pair keys are "name0/name1" NESTED h5 groups — the skip
    check must enumerate two levels or every run re-matches (regression:
    root .keys() only sees "name0")."""
    import h5py

    path = tmp_path / "matches-nn.h5"
    io.write_matches(path, "a.jpg", "b.jpg", np.array([0, -1]), [0.9, 0.0])
    with h5py.File(path, "r") as f:
        existing = {
            f"{a}/{b}" for a in f.keys() if isinstance(f[a], h5py.Group) for b in f[a].keys()
        }
    assert io.names_to_pair("a.jpg", "b.jpg") in existing


def test_tvg_cache_roundtrip(tmp_path):
    """Two-view geometry cache (COLMAP two_view_geometries analog):
    put/get roundtrip + invalidation when matches CONTENT, keypoints or
    verification params change, even at coinciding match counts
    (ADVICE r2: count-only keying silently reused stale geometries)."""
    from mpsfm_tpu.estimators.two_view import TwoViewGeometry
    from mpsfm_tpu.geometry.rotations import Rigid3d
    from mpsfm_tpu.scene.correspondences import _TvgCache

    tvg = TwoViewGeometry(
        2, np.array([[0, 1], [2, 3]]), Rigid3d(np.array([1.0, 0, 0, 0]), np.zeros(3)),
        5.0, np.eye(3), 2,
    )
    matches = np.array([[0, 1], [2, 3], [4, 5]])
    kps0 = np.arange(12, dtype=np.float64).reshape(6, 2)
    kps1 = kps0 + 0.5
    dig = _TvgCache._digest(matches, kps0, kps1, 4.0, 512)
    c = _TvgCache(tmp_path / "tvg.h5")
    c.put("a.jpg", "b.jpg", dig, tvg)
    back = c.get("a.jpg", "b.jpg", dig)
    assert back is not None and back.num_inliers == 2
    assert back.inlier_matches.tolist() == [[0, 1], [2, 3]]
    assert int(back.config) == 2 and back.tri_angle == 5.0
    # same count, different content -> miss
    m2 = matches.copy()
    m2[0, 1] = 9
    assert c.get("a.jpg", "b.jpg", _TvgCache._digest(m2, kps0, kps1, 4.0, 512)) is None
    # moved keypoints -> miss
    assert c.get("a.jpg", "b.jpg", _TvgCache._digest(matches, kps0 + 1, kps1, 4.0, 512)) is None
    # different RANSAC params -> miss
    assert c.get("a.jpg", "b.jpg", _TvgCache._digest(matches, kps0, kps1, 2.0, 512)) is None
    assert c.get("a.jpg", "b.jpg", _TvgCache._digest(matches, kps0, kps1, 4.0, 256)) is None
    assert c.get("a.jpg", "c.jpg", dig) is None
    # slash-bearing names collapse to the canonical pair key, no nesting
    c.put("d/a.jpg", "b.jpg", dig, tvg)
    assert c.get("d/a.jpg", "b.jpg", dig) is not None
    assert all("/" not in k for k in c._f.keys())
    c.close()


def test_lightglue_attention_paths_agree(rng):
    """qchunk (TPU production default, round 4) / stream / einsum are the
    same math tiled differently — must agree to fp tolerance, including
    masked key padding."""
    import jax.numpy as jnp

    from mpsfm_tpu.extraction.matchers.lightglue import LightGlue

    B, N, M, H, hd = 2, 96, 80, 2, 16
    q = jnp.asarray(rng.normal(size=(B, N, H, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, M, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, M, H, hd)).astype(np.float32))
    kv_mask = jnp.asarray(np.arange(M)[None, :] < np.array([[M], [M - 17]]))
    scale = 1.0 / np.sqrt(hd)
    ref = LightGlue._attention(q, k, v, None, kv_mask, scale)  # einsum (default off-TPU)
    qc = LightGlue._attention_qchunk(q, k, v, kv_mask, scale, block=32)
    st = LightGlue._attention_streaming(q, k, v, kv_mask, scale, block=16)
    np.testing.assert_allclose(np.asarray(qc), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref), atol=2e-5)
