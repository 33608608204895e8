"""Full-stack test: rendered RGB-D images -> CLI pipeline -> COLMAP output.

Exercises every layer on real (rendered) pixels: classical feature
detection, NN matching, batched geometric verification, measured-depth
priors, incremental mapping with integration + DC checks, and the
COLMAP-format writer — with ATE checked against the render poses.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from synthetic import PlaneScene, render_scene_dir, umeyama_alignment


@pytest.mark.slow
def test_cli_pipeline_on_rendered_scene(tmp_path, rng):
    scene = PlaneScene(
        rng=rng, n_images=5, n_points=0, img_wh=(320, 240), focal=260.0, baseline=0.3
    )
    data_dir = render_scene_dir(scene, tmp_path / "scene", rng=rng, depth_noise=0.01)

    from mpsfm_tpu.config import Config
    from mpsfm_tpu.datasets.simple import SimpleParser
    from mpsfm_tpu.pipeline import ReconstructionManager

    parser = SimpleParser(data_dir, depth_dir=data_dir / "depth")
    conf = Config.create(ReconstructionManager.default_conf).merged(
        {
            "matches_mode": "sparse+measured",
            "extractors": {
                "features": "classical",
                "matcher": "nn",
                "pairs_type": "exhaustive",
                "feature_conf": {"max_keypoints": 1024},
                "resize_max": 0,
            },
            "mapper": {
                "int_covs": False,
                "ba": {"max_iters": 10},
                "registration": {"num_hyp": 256},
            },
            "image_priors": {
                "cg_max_iter": 150,
                "max_iter": 3,
                "depth": {"prior_uncertainty": True, "depth_uncertainty": None,
                          "prior_std_multiplier": 1.0},
            },
        }
    )
    mgr = ReconstructionManager(conf, parser, tmp_path / "cache", tmp_path / "out")
    rec, ok = mgr()
    assert ok
    # priors must actually be attached (guards against silently falling
    # back to prior-less SfM — a real regression caught by the CLI drive)
    n_priors = sum(1 for im in rec.images.values() if getattr(im, "depth", None) is not None)
    assert n_priors == 5, f"priors attached to {n_priors}/5 images"
    assert rec.num_reg_images() >= 4, f"registered {rec.num_reg_images()}/5"
    assert rec.num_points3D() > 50

    # ATE vs render poses
    est, gt = [], []
    for imid in rec.reg_image_ids():
        est.append(rec.images[imid].pose.center())
        idx = int(rec.images[imid].name[2:4])
        gt.append(scene.poses[idx].center())
    est, gt = np.stack(est), np.stack(gt)
    s, R, t = umeyama_alignment(est, gt)
    ate = float(np.sqrt((((s * (R @ est.T)).T + t - gt) ** 2).sum(-1).mean()))
    assert ate < 0.1, f"ATE {ate}"

    # COLMAP outputs exist and parse
    out = tmp_path / "out"
    assert (out / "cameras.txt").exists()
    assert (out / "images.txt").exists()
    assert (out / "points3D.txt").exists()
    assert (out / "depths.h5").exists()
    from mpsfm_tpu.utils.colmap_io import read_text

    rec2 = read_text(out)
    assert len(rec2.registered_images) == rec.num_reg_images()

    # extraction caches are reused on a second run (no re-extraction)
    mgr2 = ReconstructionManager(conf, parser, tmp_path / "cache", tmp_path / "out2")
    rec3, ok3 = mgr2()
    assert ok3 and rec3.num_reg_images() >= 4
