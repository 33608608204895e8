"""Curated config set: composition + registry resolution.

Mirrors the reference's configs/ surface (8 pipeline configs + defaults/
calibrations + paper/ variants, SURVEY.md §5 config system) mapped onto
this framework's backends.
"""

import glob
import os

import pytest

from mpsfm_tpu.config import load_cfg
from mpsfm_tpu.extraction.base import FEATURE_MODELS, MATCHER_MODELS

REPO = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True))

DENSE_MATCHERS = {"dense_ncc", "ncc", "two_view", "mast3r_class", "mast3r", "warp", "roma_class", "roma"}
PAIR_TYPES = {"exhaustive", "sequential", "retrieval"}


def test_config_inventory_matches_reference_surface():
    names = {os.path.relpath(p, os.path.join(REPO, "configs")) for p in CONFIGS}
    expected = {
        "sp-lg_m3dv2.yaml", "sp-lg_m3dv2-large.yaml", "sp-lg_m3dv2-small.yaml",
        "sp-lg_depthpro.yaml", "sp-lg_dav2.yaml", "sp-mast3r.yaml",
        "sp-mast3r-dense.yaml", "sp-roma_m3dv2.yaml", "sp-roma-dense_m3dv2.yaml",
        "custom.yaml", "example.yaml",
        "defaults/m3dv2-large.yaml", "defaults/m3dv2-small.yaml",
        "defaults/depthpro.yaml", "defaults/depthanythingv2.yaml",
        "defaults/mast3r.yaml",
        "paper/sp-lg_m3dv2.yaml", "paper/sp-mast3r.yaml",
        "paper/sp-roma-dense_m3dv2.yaml",
    }
    assert expected <= names, expected - names


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.basename(p))
def test_config_composes_and_resolves(path):
    conf = load_cfg(path)
    ex = conf.get("extractors", {})
    if "features" in ex:
        assert ex["features"] in FEATURE_MODELS, ex["features"]
    if "matcher" in ex:
        assert ex["matcher"] in MATCHER_MODELS, ex["matcher"]
    if "dense_matcher" in ex:
        assert ex["dense_matcher"] in DENSE_MATCHERS, ex["dense_matcher"]
    if "pairs_type" in ex:
        assert ex["pairs_type"] in PAIR_TYPES
    mm = conf.get("matches_mode")
    if mm is not None:
        assert any(tok in mm for tok in ("sparse", "dense", "depth", "measured")), mm


def test_calibration_defaults_match_reference_constants():
    c = load_cfg(os.path.join(REPO, "configs", "defaults", "m3dv2-large.yaml"))
    assert c.image_priors.depth.prior_std_multiplier == 3.7757
    c = load_cfg(os.path.join(REPO, "configs", "defaults", "depthpro.yaml"))
    assert c.image_priors.depth.depth_uncertainty == 0.0875
    assert c.image_priors.depth.prior_uncertainty is False
    c = load_cfg(os.path.join(REPO, "configs", "defaults", "mast3r.yaml"))
    assert c.image_priors.depth.prior_std_multiplier == 0.862
