"""Pallas fused BiNI kernel vs the XLA implementation (interpret on CPU)."""

import numpy as np
import pytest

from mpsfm_tpu.integration.bini import BiniParams, bini_solve
from mpsfm_tpu.integration.bini_pallas import bini_solve_pallas

from test_integration_bini import make_inputs, plane_scene, H, W


def test_pallas_matches_xla(rng):
    depth_gt, normals = plane_scene(rng)
    depth_noisy, _ = plane_scene(rng, noise=0.03)
    inp = make_inputs(depth_noisy, normals)
    params = BiniParams(max_iter=3, cg_max_iter=120)
    z_ref, info = bini_solve(inp, params)
    z_pal = bini_solve_pallas(inp, params, interpret=True)
    ref = np.asarray(z_ref)
    pal = np.asarray(z_pal)
    assert pal.shape == ref.shape
    # both solve the same linear systems; agreement in log-depth
    assert np.abs(pal - ref).mean() < 2e-3, np.abs(pal - ref).mean()


def test_pallas_improves_depth(rng):
    depth_gt, normals = plane_scene(rng)
    depth_noisy, _ = plane_scene(rng, noise=0.03)
    inp = make_inputs(depth_noisy, normals)
    z = bini_solve_pallas(inp, BiniParams(max_iter=4, cg_max_iter=150), interpret=True)
    refined = np.exp(np.asarray(z, np.float64))
    e_prior = np.abs(np.log(depth_noisy) - np.log(depth_gt)).mean()
    e_ref = np.abs(np.log(refined) - np.log(depth_gt)).mean()
    assert e_ref < 0.5 * e_prior
