"""Distributed BA on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_sharded_ba_matches_single_device():
    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.ba.solver import solve_ba
    from mpsfm_tpu.parallel.dist_ba import make_mesh, solve_ba_sharded

    data = _synthetic_ba_data(n_cams=8, n_pts=128)
    q1, t1, x1, info1 = solve_ba(data, max_iters=3, cg_iters=30)
    mesh = make_mesh(8)
    q2, t2, x2, info2 = solve_ba_sharded(data, mesh, max_iters=3, cg_iters=30)
    # identical math, replicated outputs
    np.testing.assert_allclose(np.asarray(info1["cost0"]), np.asarray(info2["cost0"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=5e-3)
    np.testing.assert_allclose(np.asarray(info1["cost"]), np.asarray(info2["cost"]), rtol=1e-2)


def test_sharded_ba_mesh_sizes():
    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.parallel.dist_ba import make_mesh, solve_ba_sharded

    data = _synthetic_ba_data(n_cams=4, n_pts=64)
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        q, t, x, info = solve_ba_sharded(data, mesh, max_iters=2, cg_iters=20)
        assert float(info["cost"]) <= float(info["cost0"])
        assert np.isfinite(np.asarray(x)).all()


def test_sharded_obs_layouts():
    """Odd observation counts fall back to replication without breaking."""
    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.parallel.dist_ba import make_mesh, shard_ba_data

    data = _synthetic_ba_data(n_cams=3, n_pts=33)  # No = 99, not divisible by 8
    mesh = make_mesh(8)
    sharded = shard_ba_data(data, mesh)
    assert sharded.r_uv.shape[0] == data.r_uv.shape[0]


def test_sharded_feature_inference_matches_sequential():
    """run_sharded_batches over the virtual 8-device mesh reproduces the
    per-image forward exactly (DataParallel equivalent, SURVEY §2.2)."""
    import numpy as np

    from mpsfm_tpu.extraction.features.classical import ClassicalFeatures
    from mpsfm_tpu.parallel.sharded_inference import data_mesh, run_sharded_batches

    rng = np.random.default_rng(0)
    model = ClassicalFeatures({"max_keypoints": 64, "resize_max": 0})
    imgs = [rng.random((40, 48)).astype(np.float32) for _ in range(5)]  # 5 !% 8: exercises padding
    seq = [model(im) for im in imgs]

    mesh = data_mesh()
    assert mesh.devices.size == 8
    outs = run_sharded_batches(model.batch_fn(), imgs, lambda x: x, mesh=mesh)
    for s, o in zip(seq, outs):
        p = ClassicalFeatures.postprocess(o)
        np.testing.assert_allclose(p["keypoints"], s["keypoints"], atol=1e-5)
        np.testing.assert_allclose(p["descriptors"], s["descriptors"], atol=1e-4)


def test_sharded_inference_shape_buckets():
    import numpy as np

    from mpsfm_tpu.parallel.sharded_inference import run_sharded_batches

    import jax.numpy as jnp

    items = [np.full((4, 4), i, np.float32) for i in range(3)] + [np.full((8, 8), 9.0, np.float32)]
    outs = run_sharded_batches(lambda b: b.sum(axis=(1, 2)), items, lambda x: x)
    assert [float(o) for o in outs] == [0.0, 16.0, 32.0, 9.0 * 64]
