"""On-scene-trained neural prior -> depth-lifted registration, e2e
(VERDICT r3 item 3 — the framework's headline capability, demonstrated
with a REAL trained network forward instead of oracle priors).

Story (mirrors the reference's deployment: priors rescue registration
where geometry-only SfM cannot bridge viewpoint gaps — reference
mpsfm/sfm/mapper/registration.py:375-391):

1. A mapping pass captures the scene as posed RGB-D (10 views).
2. The framework-native MonoViT prior (nets/mono.py) is TRAINED on that
   pass (nets/train_mono.py fit_scene_prior) — depth + normals + its own
   calibrated confidence/kappa variance heads.
3. A new capture of the same scene is a low-overlap chain: consecutive
   views share ~50% of their footprint and views two apart share NOTHING,
   so any init pair's triangulated points are invisible to the next view
   — classic incremental SfM registers exactly the init pair and stops.
4. With `extractors.depth: vit_mono` + the trained weights, the mapper
   lifts the registered views' predicted depth at matched keypoints into
   2D-3D correspondences and registers the whole chain; the uncertainty
   chain runs off the net's own variance heads. ATE-checked against the
   render poses.

The control and prior runs go through the real CLI in fresh interpreters
(the production surface, same pattern as test_pipeline_e2e).
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from synthetic import PlaneScene, _rotvec_quat, render_scene_dir, umeyama_alignment
from mpsfm_tpu.scene.reconstruction import Pose

W, H, F = 320, 240, 260.0
PLANE = dict(
    img_wh=(W, H), focal=F, wedge=True, n_points=0,
    plane_normal=(0.12, -0.08), wedge_normal=(-0.28, 0.06), d0=5.0, wedge_d0=3.8,
)

NOPRIOR_CONF = """
matches_mode: sparse
use_priors: false
extractors: {features: classical, matcher: nn, pairs_type: exhaustive, feature_conf: {max_keypoints: 1024}, resize_max: 0}
mapper: {int_covs: false, ba: {max_iters: 10}, registration: {num_hyp: 256}}
"""

PRIOR_CONF = """
matches_mode: sparse
extractors:
  features: classical
  matcher: nn
  pairs_type: exhaustive
  depth: vit_mono
  depth_conf: {dim: 96, depth_blocks: 4, num_heads: 2, patch: 16, feat: 48, canonical_focal: 260.0, resize_long: 128, weights_path: '%(weights)s'}
  feature_conf: {max_keypoints: 1024}
  resize_max: 0
mapper: {int_covs: false, ba: {max_iters: 10}, registration: {num_hyp: 256}}
image_priors:
  depth: {prior_uncertainty: true, depth_uncertainty: 0.05, prior_std_multiplier: 2.0}
"""


def _base_scene():
    return PlaneScene(n_images=1, rng=np.random.default_rng(0), **PLANE)


def _pose_at(x, y=0.0, i=0):
    q = _rotvec_quat(np.array([0.008, 0.012, 0.004]) * (i % 3))
    return Pose(q, np.array([-x, -y, 0.0]))


def _overlap_frac(scene, pi, pj):
    """Fraction of view i's surface points visible in view j."""
    d = scene.plane_depth(pi)
    xs, ys = np.meshgrid(np.arange(0, W, 4), np.arange(0, H, 4))
    xy = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    z = d[xy[:, 1].astype(int), xy[:, 0].astype(int)]
    xyn = (xy - [W / 2, H / 2]) / F
    pc = np.concatenate([xyn, np.ones((len(xy), 1))], -1) * z[:, None]
    pw = pi.inverse().transform(pc)
    pc2 = pj.transform(pw)
    uv = pc2[:, :2] / np.clip(pc2[:, 2:3], 1e-6, None) * F + [W / 2, H / 2]
    inb = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H) & (pc2[:, 2] > 0)
    return inb.mean()


def _chain_positions(scene, n, target=0.5):
    """Camera x-positions with MEASURED consecutive footprint overlap ==
    target (the wedge's depth field shrinks footprints nonuniformly, so a
    fixed-baseline formula would drift)."""
    xs = [0.0]
    for k in range(1, n):
        lo, hi = xs[-1] + 0.1, xs[-1] + 8.0
        for _ in range(30):
            mid = 0.5 * (lo + hi)
            f = _overlap_frac(scene, _pose_at(xs[-1], i=k - 1), _pose_at(mid, i=k))
            if f > target:
                lo = mid
            else:
                hi = mid
        xs.append(0.5 * (lo + hi))
    return np.array(xs)


def _make_scene(xs, ys=None):
    sc = _base_scene()
    sc.poses = [_pose_at(x, 0.0 if ys is None else ys[i], i) for i, x in enumerate(xs)]
    return sc


def _run_cli(data_dir, out_dir, conf_path, timeout=1500, use_cpu=True):
    env = dict(os.environ)
    pre = ""
    if use_cpu:
        env["JAX_PLATFORMS"] = "cpu"
        pre = "import jax; jax.config.update('jax_platforms','cpu');"
    repo = str(Path(__file__).parent.parent)
    proc = subprocess.run(
        [
            sys.executable, "-c",
            pre
            + f"import sys; sys.argv=['reconstruct.py','--conf','{conf_path}',"
            f"'--data_dir','{data_dir}','--sfm_outputs_dir','{out_dir}'];"
            f"sys.path.insert(0,'{repo}');"
            "from reconstruct import main; main()",
        ],
        capture_output=True, text=True, timeout=timeout, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_trained_prior_rescues_low_overlap_chain(tmp_path):
    base = _base_scene()
    test_xs = _chain_positions(base, 4, target=0.5)
    # the designed failure mode: consecutive ~50% overlap, skip-pairs none
    assert _overlap_frac(base, _pose_at(test_xs[0], i=0), _pose_at(test_xs[2], i=2)) < 0.02
    assert _overlap_frac(base, _pose_at(test_xs[1], i=1), _pose_at(test_xs[3], i=3)) < 0.02

    train_xs = np.linspace(test_xs.min() - 1.0, test_xs.max() + 1.0, 10)
    train_ys = np.tile([0.0, 0.25, -0.2], 4)[:10]
    sc_train = _make_scene(train_xs, train_ys)
    sc_test = _make_scene(test_xs)

    # 1) mapping pass (posed RGB-D) + 2) new low-overlap RGB-only capture
    # of the SAME scene (same plane params + texture rng seed)
    train_dir = render_scene_dir(
        sc_train, tmp_path / "train", rng=np.random.default_rng(7),
        plane_extent=16.0, supersample=3,
    )
    capture_dir = render_scene_dir(
        sc_test, tmp_path / "capture", rng=np.random.default_rng(7),
        plane_extent=16.0, write_depth=False, supersample=3,
    )

    # 3) train the native prior on the mapping pass
    from mpsfm_tpu.extraction.nets.train_mono import fit_scene_prior

    wpath, backend_conf, history = fit_scene_prior(
        train_dir, tmp_path / "mono.msgpack", steps=500, batch=10, lr=2e-3,
        canonical_focal=F, resize_long=128,
    )
    assert history["log_d_mae"] < 0.30, history

    # control: geometry-only SfM cannot bridge the chain
    conf_np = tmp_path / "noprior.yaml"
    conf_np.write_text(NOPRIOR_CONF)
    out_np = _run_cli(capture_dir, tmp_path / "out_noprior", conf_np)
    from mpsfm_tpu.utils.colmap_io import read_text

    rec_np = read_text(tmp_path / "out_noprior")
    assert len(rec_np.registered_images) <= 2, (
        f"control registered {len(rec_np.registered_images)}/4 — "
        f"scene no longer low-overlap enough\n{out_np[-400:]}"
    )

    # prior run: trained-net depth lifts registration across the chain
    conf_pr = tmp_path / "prior.yaml"
    conf_pr.write_text(PRIOR_CONF % {"weights": str(wpath)})
    _run_cli(capture_dir, tmp_path / "out_prior", conf_pr)
    rec_pr = read_text(tmp_path / "out_prior")
    assert len(rec_pr.registered_images) == 4, (
        f"prior run registered {len(rec_pr.registered_images)}/4"
    )
    assert rec_pr.num_points3D() > 100

    # 4) ATE vs render poses (scene extent ~6 units; bound = ~1.7%)
    est, gt = [], []
    for imid, im in rec_pr.registered_images.items():
        est.append(im.pose.center())
        gt.append(sc_test.poses[int(im.name[2:4])].center())
    est, gt = np.stack(est), np.stack(gt)
    s, R, t = umeyama_alignment(est, gt)
    err = np.linalg.norm((s * est @ R.T + t) - gt, axis=1)
    ate = float(np.sqrt((err**2).mean()))
    assert ate < 0.1, f"ATE {ate}"


@pytest.mark.slow
def test_train_mono_fast_convergence_and_calibration(tmp_path):
    """Fast unit check: a few steps of train_mono reduce the loss, the
    confidence head is NOT saturated (the NLL-saturation trap guarded in
    _loss_fn), and weights round-trip through ViTMonoBackend."""
    from mpsfm_tpu.extraction.nets.train_mono import save_mono_params, train_mono

    rng = np.random.default_rng(0)
    N, h, w = 3, 64, 64
    imgs = rng.uniform(0, 1, (N, h, w, 3)).astype(np.float32)
    yy = np.linspace(0, 1, h)[None, :, None]
    depths = (2.0 + yy + 0.3 * imgs[..., 0]).astype(np.float32)
    from mpsfm_tpu.extraction.priors import normals_from_depth

    normals = np.stack([normals_from_depth(d, 100.0, 100.0, w / 2, h / 2) for d in depths])
    net, params, hist0 = train_mono(
        imgs, depths, normals.astype(np.float32),
        net_conf={"dim": 32, "depth_blocks": 2, "num_heads": 2, "feat": 16},
        steps=2, batch=2, seed=0,
    )
    net, params, hist = train_mono(
        imgs, depths, normals.astype(np.float32),
        net_conf={"dim": 32, "depth_blocks": 2, "num_heads": 2, "feat": 16},
        steps=60, batch=2, seed=0,
    )
    assert hist["loss"] < hist0["loss"]
    assert hist["log_d_mae"] < hist0["log_d_mae"]

    wpath = tmp_path / "m.msgpack"
    save_mono_params(params, wpath)
    from mpsfm_tpu.extraction.nets.mono import ViTMonoBackend

    be = ViTMonoBackend({
        "dim": 32, "depth_blocks": 2, "num_heads": 2, "feat": 16,
        "weights_path": str(wpath), "canonical_focal": 100.0, "resize_long": 64,
    })
    out = be(imgs[0], intrinsics=(100.0, 100.0, w / 2, h / 2))
    assert out["depth"].shape == (h, w)
    assert np.isfinite(out["depth"]).all() and (out["depth"] > 0).all()
    # calibration: predicted relative sigma must not be pinned at 1.0
    sig = np.sqrt(out["depth_variance"]) / np.maximum(out["depth"], 1e-9)
    assert np.median(sig) < 0.95, "confidence head saturated"
    # resize_long path: inference at a different native size still works
    big = np.repeat(np.repeat(imgs[0], 2, 0), 2, 1)
    out2 = be(big, intrinsics=(200.0, 200.0, w, h))
    assert out2["depth"].shape == (2 * h, 2 * w)
    # depth is resolution-invariant; the doubled focal cancels the resize
    assert np.abs(np.median(out2["depth"]) / np.median(out["depth"]) - 1.0) < 0.2


PRIOR_CONF_387 = """
matches_mode: sparse
verbose: 2
extractors:
  features: classical
  matcher: nn
  pairs_type: exhaustive
  depth: vit_mono
  depth_conf: {dim: 96, depth_blocks: 4, num_heads: 2, patch: 16, feat: 48, canonical_focal: 520.0, resize_long: 384, weights_path: '%(weights)s'}
  feature_conf: {max_keypoints: 1024}
  resize_max: 0
mapper: {int_covs: true, ba: {max_iters: 10}, registration: {num_hyp: 256}}
image_priors:
  depth: {prior_uncertainty: true, depth_uncertainty: 0.05, prior_std_multiplier: 2.0}
"""


@pytest.mark.slow
def test_trained_prior_e2e_at_reference_normscale(tmp_path):
    """VERDICT r4 item 4b: the trained-prior e2e at the REFERENCE's
    working resolution — images larger than normscale 387, so the
    integration grids actually run at the reference's internal prior
    resolution (scene/reconstruction/base.py:27), on the DEFAULT jax
    backend (the real chip when the axon plugin is present). Asserts the
    full uncertainty chain executes (int_covs on, refined depth +
    uncertainty written) and the DC gates fire."""
    base = _base_scene()
    test_xs = _chain_positions(base, 4, target=0.5)

    # 2x resolution, same FOV (focal scales with the image): the chain
    # geometry (overlap fractions) is resolution-invariant
    W2, H2, F2 = 640, 480, 520.0
    plane2 = dict(PLANE, img_wh=(W2, H2), focal=F2)

    def scene_at(xs, ys=None):
        sc = PlaneScene(n_images=1, rng=np.random.default_rng(0), **plane2)
        sc.poses = [_pose_at(x, 0.0 if ys is None else ys[i], i) for i, x in enumerate(xs)]
        return sc

    train_xs = np.linspace(test_xs.min() - 1.0, test_xs.max() + 1.0, 10)
    train_ys = np.tile([0.0, 0.25, -0.2], 4)[:10]
    sc_train = scene_at(train_xs, train_ys)
    sc_test = scene_at(test_xs)

    train_dir = render_scene_dir(
        sc_train, tmp_path / "train", rng=np.random.default_rng(7),
        plane_extent=16.0, supersample=2,
    )
    capture_dir = render_scene_dir(
        sc_test, tmp_path / "capture", rng=np.random.default_rng(7),
        plane_extent=16.0, write_depth=False, supersample=2,
    )

    # train ON THE DEFAULT BACKEND in a fresh interpreter (the conftest
    # pins this process to CPU; the chip run needs a clean process)
    repo = str(Path(__file__).parent.parent)
    wpath = tmp_path / "mono387.msgpack"
    code = (
        f"import sys; sys.path.insert(0, {repo!r});"
        "from mpsfm_tpu.extraction.nets.train_mono import fit_scene_prior;"
        "import json;"
        f"w, conf, h = fit_scene_prior({str(train_dir)!r}, {str(wpath)!r},"
        " steps=400, batch=10, lr=2e-3, canonical_focal=520.0, resize_long=384);"
        "print('HIST', json.dumps({k: float(v) for k, v in h.items()}))"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=2400, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    import json as _json

    hist = _json.loads(proc.stdout.split("HIST", 1)[1].strip().splitlines()[0])
    assert hist["log_d_mae"] < 0.30, hist

    conf_pr = tmp_path / "prior387.yaml"
    conf_pr.write_text(PRIOR_CONF_387 % {"weights": str(wpath)})
    out = _run_cli(capture_dir, tmp_path / "out_prior387", conf_pr,
                   timeout=2400, use_cpu=False)
    from mpsfm_tpu.utils.colmap_io import read_text

    rec = read_text(tmp_path / "out_prior387")
    assert len(rec.registered_images) == 4, out[-800:]
    # DC gates fired (verbose-2 mapper logs each passed check)
    assert "Depth consistency" in out, out[-800:]

    # uncertainty chain artifacts: refined depth + uncertainty at the
    # 387-capped integration grid
    import h5py

    with h5py.File(tmp_path / "out_prior387" / "depths.h5", "r") as f:
        names = list(f.keys())
        assert names
        grp = f[names[0]]
        assert "uncertainty" in grp and "prior_depth" in grp
        assert max(grp["prior_depth"].shape) == 387, grp["prior_depth"].shape

    # ATE vs render poses
    est, gt = [], []
    for imid, im in rec.registered_images.items():
        est.append(im.pose.center())
        gt.append(sc_test.poses[int(im.name[2:4])].center())
    est, gt = np.stack(est), np.stack(gt)
    s, R, t = umeyama_alignment(est, gt)
    err = np.linalg.norm((s * est @ R.T + t) - gt, axis=1)
    ate = float(np.sqrt((err**2).mean()))
    assert ate < 0.1, f"ATE {ate}"
