"""End-to-end incremental mapping on a synthetic analytic scene."""

import numpy as np
import pytest

from mpsfm_tpu.mapper import MpsfmMapper
from mpsfm_tpu.scene.correspondences import Correspondences

from synthetic import PlaneScene, ate_rmse


def run_pipeline(rng, mapper_conf=None, **scene_kw):
    scene = PlaneScene(rng=rng, **scene_kw)
    rec, keypoints, matches, gt = scene.build()
    corr = Correspondences({"num_hyp": 256}, rec)
    corr.populate(keypoints, matches)
    conf = {
        "verbose": 0,
        "int_covs": False,  # covs via fallback exercised separately
        "ba": {"max_iters": 12},
        "registration": {"num_hyp": 256},
    }
    if mapper_conf:
        from mpsfm_tpu.config import Config

        conf = Config.create(conf).merged(mapper_conf).to_dict()
    mapper = MpsfmMapper(conf, rec, corr)
    rec, ok = mapper()
    return rec, ok, gt, mapper


@pytest.mark.slow
def test_mapper_registers_all_images(rng):
    rec, ok, gt, mapper = run_pipeline(rng, n_images=6, n_points=300)
    assert ok
    assert rec.num_reg_images() == 6, f"registered {rec.num_reg_images()}/6"
    assert rec.num_points3D() > 100
    err = ate_rmse(rec, gt["poses"])
    # scene extent ~2.5 units; ATE after alignment should be small
    assert err < 0.05, f"ATE {err}"


@pytest.mark.slow
def test_mapper_without_priors(rng):
    """Pipeline degrades gracefully to classic SfM when no depth priors."""
    scene = PlaneScene(rng=rng, n_images=5, n_points=300, point_jitter=0.4)
    rec, keypoints, matches, gt = scene.build(with_priors=False)
    corr = Correspondences({"num_hyp": 256}, rec)
    corr.populate(keypoints, matches)
    mapper = MpsfmMapper(
        {
            "integrate": False,
            "depth_consistency": False,
            "int_covs": False,
            "ba": {"max_iters": 12, "use_depth": False},
            "registration": {"num_hyp": 256, "init_min_num_points": 20},
        },
        rec,
        corr,
    )
    rec, ok = mapper()
    assert ok
    assert rec.num_reg_images() >= 4
    assert ate_rmse(rec, gt["poses"]) < 0.05


@pytest.mark.slow
def test_mapper_exploration_flags(rng):
    """Pipeline still registers everything with the exploration ladder
    features on (pre_fail, DC resample, AP bundle resample)."""
    rec, ok, gt, mapper = run_pipeline(
        rng,
        mapper_conf={
            "pre_fail": True,
            "depth_consistency_checker": {"depth_consistency_resample": True},
            "registration": {"resample_bundle": True},
        },
        n_images=6,
        n_points=300,
    )
    assert ok
    assert rec.num_reg_images() == 6, f"registered {rec.num_reg_images()}/6"
    assert ate_rmse(rec, gt["poses"]) < 0.05
