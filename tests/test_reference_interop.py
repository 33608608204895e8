"""Reference-cache interop: artifacts written in the REFERENCE's exact
HDF5 schemas (hloc feature files, matches0/matching_scores0 pair groups,
mono prior maps) drive our mapping end-to-end — the file-level seam
SURVEY §7.1 promises (the reference's Extraction-to-mapper interface IS
these files, so a user can point mpsfm_tpu at caches produced by
tauzn-clock/mpsfm and reconstruct without re-extraction).

Writer code below intentionally uses raw h5py calls mirroring the
reference writers (mpsfm/extraction/imagewise/features/base.py:71-80
fp16 + keypoints.attrs['uncertainty']; pairwise/match_sparse.py
matches0/matching_scores0; imagewise/geometry/base.py:40-48 per-name
prior groups) — NOT our utils/io helpers.
"""

import hashlib
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

from synthetic import PlaneScene, render_scene_dir

sys.path.insert(0, str(Path(__file__).parent))


def _sha(path):
    return hashlib.sha1(Path(path).read_bytes()).hexdigest()


@pytest.mark.slow
def test_mapping_from_reference_format_caches(tmp_path):
    import cv2

    from mpsfm_tpu.extraction.features.classical import ClassicalFeatures

    data_dir = tmp_path / "scene"
    scene = PlaneScene(
        rng=np.random.default_rng(5), n_images=5, img_wh=(320, 240),
        focal=260.0, baseline=0.3, wedge=True,
    )
    render_scene_dir(scene, data_dir, rng=np.random.default_rng(5), depth_noise=0.0)
    cache = data_dir / "cache"
    cache.mkdir()

    names = sorted(p.name for p in (data_dir / "images").iterdir())

    # ---- features: hloc schema (fp16, uncertainty attr, image_size)
    model = ClassicalFeatures({"max_keypoints": 1024, "resize_max": 0})
    feats = {}
    for n in names:
        img = cv2.imread(str(data_dir / "images" / n), cv2.IMREAD_GRAYSCALE)
        pred = model(img.astype(np.float32) / 255.0)
        pred["image_size"] = np.array(img.shape[::-1])
        feats[n] = pred
    with h5py.File(cache / "feats-classical.h5", "a", libver="latest") as fd:
        for n, pred in feats.items():
            grp = fd.create_group(n)
            for k in ("keypoints", "descriptors", "scores"):
                if k in pred:
                    v = np.asarray(pred[k])
                    if v.dtype == np.float32:
                        v = v.astype(np.float16)  # reference as_half=True
                    grp.create_dataset(k, data=v)
            grp.create_dataset("image_size", data=pred["image_size"])
            grp["keypoints"].attrs["uncertainty"] = 1.0

    # ---- matches: match_sparse.py schema (full-length matches0 / scores0)
    def mutual_nn(d0, d1):
        sim = d0 @ d1.T
        j = sim.argmax(1)
        i_back = sim.argmax(0)
        mutual = i_back[j] == np.arange(len(d0))
        m0 = np.where(mutual, j, -1).astype(np.int32)
        s0 = np.where(mutual, sim.max(1), 0.0).astype(np.float16)
        return m0, s0

    from mpsfm_tpu.utils.io import names_to_pair

    with h5py.File(cache / "matches-nn.h5", "a", libver="latest") as fd:
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                m0, s0 = mutual_nn(
                    np.asarray(feats[names[i]]["descriptors"], np.float32),
                    np.asarray(feats[names[j]]["descriptors"], np.float32),
                )
                grp = fd.create_group(names_to_pair(names[i], names[j]))
                grp.create_dataset("matches0", data=m0)
                grp.create_dataset("matching_scores0", data=s0)

    # ---- mono priors: geometry/base.py schema (reference return_types)
    fx = fy = 260.0
    cx, cy = 320 / 2 - 0.5, 240 / 2 - 0.5
    from mpsfm_tpu.extraction.priors import normals_from_depth

    with h5py.File(cache / "depth-oracle.h5", "a", libver="latest") as fd:
        for n in names:
            d = np.load(data_dir / "depth" / (Path(n).stem + ".npy"))
            grp = fd.create_group(n)
            grp.create_dataset("depth", data=d)
            grp.create_dataset("depth_variance", data=(0.01 * d) ** 2)
            grp.create_dataset("valid", data=d > 0)
            grp.create_dataset("normals", data=normals_from_depth(d, fx, fy, cx, cy))
            grp.create_dataset("normals_variance", data=np.full(d.shape, np.deg2rad(5.0) ** 2))

    hashes = {p.name: _sha(p) for p in cache.glob("*.h5")}

    # ---- drive the pipeline from the ingested caches
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(
        """
matches_mode: sparse
extractors:
  features: classical
  matcher: nn
  pairs_type: exhaustive
  depth: oracle
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
    )
    from test_pipeline_e2e import _run_cli

    out_dir = tmp_path / "out"
    stdout = _run_cli(data_dir, out_dir, conf_path)
    assert "success=True" in stdout, stdout[-1500:]
    reg = int(stdout.split("registered=")[1].split("/")[0])
    assert reg >= 4, stdout[-1500:]

    # the caches were CONSUMED, not regenerated: byte-identical afterwards
    for p in cache.glob("*.h5"):
        if p.name in hashes:
            assert _sha(p) == hashes[p.name], f"{p.name} was rewritten"
    assert (out_dir / "images.txt").exists() or any(out_dir.iterdir())