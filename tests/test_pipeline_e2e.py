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


_PIPE_CONF = """
matches_mode: sparse+measured
extractors:
  features: classical
  matcher: nn
  pairs_type: exhaustive
  feature_conf:
    max_keypoints: 1024
  resize_max: 0
mapper:
  int_covs: false
  ba:
    max_iters: 10
  registration:
    num_hyp: 256
image_priors:
  cg_max_iter: 150
  max_iter: 3
  depth:
    prior_uncertainty: true
    depth_uncertainty: null
    prior_std_multiplier: 1.0
"""


def _run_cli(data_dir, out_dir, conf_path, timeout=1500):
    """Drive the real CLI in a fresh interpreter (the production surface;
    also isolates the heavy pipeline from in-process XLA-CPU state that
    accumulates across the suite)."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = str(Path(__file__).parent.parent)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            f"import sys; sys.argv=['reconstruct.py','--conf','{conf_path}',"
            f"'--data_dir','{data_dir}','--sfm_outputs_dir','{out_dir}'];"
            f"sys.path.insert(0,'{repo}');"
            "from reconstruct import main; main()",
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=repo,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_cli_pipeline_on_rendered_scene(tmp_path, rng):
    scene = PlaneScene(
        rng=rng, n_images=5, n_points=0, img_wh=(320, 240), focal=260.0, baseline=0.3
    )
    data_dir = render_scene_dir(scene, tmp_path / "scene", rng=rng, depth_noise=0.01)
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(_PIPE_CONF)

    out = tmp_path / "out"
    stdout = _run_cli(data_dir, out, conf_path)
    assert "success=True" in stdout, stdout[-500:]

    # COLMAP outputs exist and parse
    assert (out / "cameras.txt").exists()
    assert (out / "images.txt").exists()
    assert (out / "points3D.txt").exists()
    assert (out / "depths.h5").exists()
    from mpsfm_tpu.utils.colmap_io import read_text

    rec = read_text(out)
    assert len(rec.registered_images) >= 4, f"registered {len(rec.registered_images)}/5"
    assert rec.num_points3D() > 50

    # ATE vs render poses (from the written reconstruction)
    est, gt = [], []
    for imid, im in rec.registered_images.items():
        est.append(im.pose.center())
        gt.append(scene.poses[int(im.name[2:4])].center())
    est, gt = np.stack(est), np.stack(gt)
    s, R, t = umeyama_alignment(est, gt)
    ate = float(np.sqrt((((s * (R @ est.T)).T + t - gt) ** 2).sum(-1).mean()))
    assert ate < 0.1, f"ATE {ate}"

    # extraction caches are reused on a second run (cache dir default is
    # data_dir/cache, so the second run skips extraction)
    stdout2 = _run_cli(data_dir, tmp_path / "out2", conf_path)
    assert "success=True" in stdout2


@pytest.mark.slow
def test_cli_pipeline_pair_depth_mode(tmp_path, rng):
    """'depth' matching mode: per-pair two-view depth maps (best-confidence
    pair selection) drive the depth prior instead of the mono cache."""
    scene = PlaneScene(
        rng=rng, n_images=5, n_points=0, img_wh=(320, 240), focal=260.0, baseline=0.3
    )
    data_dir = render_scene_dir(scene, tmp_path / "scene", rng=rng, depth_noise=0.01)
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(_PIPE_CONF.replace("sparse+measured", "sparse+measured+depth"))

    out = tmp_path / "out"
    stdout = _run_cli(data_dir, out, conf_path)
    assert "success=True" in stdout, stdout[-500:]
    from mpsfm_tpu.utils.colmap_io import read_text

    rec = read_text(out)
    assert len(rec.registered_images) >= 4
    # the pair-depth cache was written and is keyed by pair/image
    import h5py

    cache = data_dir / "cache"
    pd = list(cache.glob("pair-depth-*.h5"))
    assert pd, list(cache.iterdir())
    with h5py.File(pd[0], "r") as f:
        some = []
        f.visit(some.append)
        assert any(k.endswith("depth") for k in some)
