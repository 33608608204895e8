"""Larger incremental run: growth triggers, local bundles, retriangulation."""

import numpy as np
import pytest

from mpsfm_tpu.mapper import MpsfmMapper
from mpsfm_tpu.scene.correspondences import Correspondences

from synthetic import PlaneScene, ate_rmse


@pytest.mark.slow
def test_mapper_20_images(rng):
    scene = PlaneScene(rng=rng, n_images=20, n_points=500, baseline=0.18, point_jitter=0.3)
    rec, keypoints, matches, gt = scene.build(kp_noise=0.4, outlier_frac=0.08)
    corr = Correspondences({"num_hyp": 256}, rec)
    corr.populate(keypoints, matches)
    mapper = MpsfmMapper(
        {
            "int_covs": False,
            "ba": {"max_iters": 10},
            "registration": {"num_hyp": 256},
        },
        rec,
        corr,
    )
    rec, ok = mapper()
    assert ok
    assert rec.num_reg_images() >= 18, f"registered {rec.num_reg_images()}/20"
    assert rec.num_points3D() > 250
    err = ate_rmse(rec, gt["poses"])
    assert err < 0.08, f"ATE {err}"
    # long tracks exist (complete/merge worked)
    lens = rec.track_len[rec.point_ids()]
    assert lens.max() >= 8
