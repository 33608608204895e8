"""Fused-refinement parity: the one-read-per-iteration chain
(MPSFM_FUSED_REFINE=1, the default — BiNI gate on device, BA depth rows
sampled from device-resident z, post-registration DC override, chained
int_covs) must produce the same reconstruction as the classic
read-per-step path (MPSFM_FUSED_REFINE=0, the reference-shaped flow:
integrate -> read -> host depth rows -> BA).

The fused path samples depth at keypoints in f32 on device where the
classic path samples f64 on host, so poses/points are compared with a
small tolerance; the DECISIONS (registration count, point count within
a few merges) must match.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import PlaneScene, render_scene_dir  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..")

RUNNER = r"""
import json, os, sys
sys.path.insert(0, %(root)r)
import jax
jax.config.update("jax_platforms", "cpu")
from mpsfm_tpu.config import load_cfg
from mpsfm_tpu.pipeline import reconstruct

conf = load_cfg("configs/classical-nn_measured.yaml").to_dict()
rec, ok = reconstruct(%(scene)r, conf=conf, sfm_outputs_dir=%(out)r)
poses = {
    int(i): [list(map(float, im.pose.q)), list(map(float, im.pose.t))]
    for i, im in rec.registered_images.items()
}
print("RESULT " + json.dumps({
    "ok": bool(ok),
    "n_reg": rec.num_reg_images(),
    "n_pts": rec.num_points3D(),
    "poses": poses,
}))
"""


def _run(scene_dir, out_dir, fused):
    env = dict(os.environ)
    env["MPSFM_FUSED_REFINE"] = "1" if fused else "0"
    env["JAX_PLATFORMS"] = "cpu"
    code = RUNNER % {"root": os.path.abspath(ROOT), "scene": scene_dir, "out": out_dir}
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    import json

    line = [l for l in res.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


@pytest.mark.slow
def test_fused_refine_matches_classic(tmp_path):
    scene = PlaneScene(
        rng=np.random.default_rng(5), n_images=6, img_wh=(320, 240),
        focal=260.0, baseline=0.2, wedge=True,
    )
    scene_dir = str(tmp_path / "scene")
    render_scene_dir(scene, scene_dir, rng=np.random.default_rng(5), depth_noise=0.01)

    classic = _run(scene_dir, str(tmp_path / "out_classic"), fused=False)
    fused = _run(scene_dir, str(tmp_path / "out_fused"), fused=True)

    assert classic["ok"] and fused["ok"]
    assert classic["n_reg"] == fused["n_reg"] == 6
    # identical decisions modulo a few track merges
    assert abs(classic["n_pts"] - fused["n_pts"]) <= 0.02 * classic["n_pts"]
    # pose parity: same gauge (both anchor the first pose), small drift
    for imid, (q_c, t_c) in classic["poses"].items():
        assert imid in fused["poses"]  # JSON keys: both sides are strings
        q_f, t_f = fused["poses"][imid]
        q_c, q_f = np.asarray(q_c), np.asarray(q_f)
        if np.dot(q_c, q_f) < 0:
            q_f = -q_f
        assert np.abs(q_c - q_f).max() < 5e-3, (imid, q_c, q_f)
        assert np.abs(np.asarray(t_c) - np.asarray(t_f)).max() < 2e-2, (imid, t_c, t_f)
