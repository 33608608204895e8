"""Larger incremental run: growth triggers, local bundles, retriangulation.

Runs in a subprocess: XLA-CPU segfaults after ~60 jitted programs
accumulate in one process (see test_pipeline_e2e for the same pattern).
"""

import subprocess
import sys
from pathlib import Path

import pytest

_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import numpy as np
from synthetic import PlaneScene, ate_rmse
from mpsfm_tpu.mapper import MpsfmMapper
from mpsfm_tpu.scene.correspondences import Correspondences

rng = np.random.default_rng(0)
scene = PlaneScene(rng=rng, n_images=20, n_points=500, baseline=0.18, point_jitter=0.3)
rec, keypoints, matches, gt = scene.build(kp_noise=0.4, outlier_frac=0.08)
corr = Correspondences({{"num_hyp": 256}}, rec)
corr.populate(keypoints, matches)
mapper = MpsfmMapper(
    {{"int_covs": False, "ba": {{"max_iters": 10}}, "registration": {{"num_hyp": 256}}}},
    rec,
    corr,
)
rec, ok = mapper()
assert ok
assert rec.num_reg_images() >= 18, f"registered {{rec.num_reg_images()}}/20"
assert rec.num_points3D() > 250
err = ate_rmse(rec, gt["poses"])
assert err < 0.08, f"ATE {{err}}"
lens = rec.track_len[rec.point_ids()]
assert lens.max() >= 8
print(f"LARGE-OK registered={{rec.num_reg_images()}}/20 points={{rec.num_points3D()}} ate={{err:.4f}}")
"""


@pytest.mark.slow
def test_mapper_20_images():
    repo = str(Path(__file__).parent.parent)
    tests = str(Path(__file__).parent)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo, tests=tests)],
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    assert "LARGE-OK" in proc.stdout
