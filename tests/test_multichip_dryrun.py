"""The driver's multichip dryrun configuration as a repo test (VERDICT r4
item 1).

Round 4 shipped a regression that every one of the 101 passing tests
missed because none ran the driver's exact configuration: 8-device mesh
+ ``int_covs: True`` + ``dist_ba: on`` on the PlaneScene-seed-3 scene.
This test runs the pipeline section of ``dryrun_multichip`` VERBATIM
(shared function, not a copy) so the acceptance gate lives in ``tests/``.

Root cause of the r4 failure (for the record): the integration-posterior
diag(H⁻¹) keypoint variances collapse toward var_prior/N_pixels on
scenes with near-exact normals, whitening correlated prior-scale error
at ~50σ; the stiff trivial-loss depth terms then tore the map down to
single-digit points per image and the final robustified filter pass
deregistered an image. Fixed by the ``int_cov_rel_floor`` posterior
floor (scene/image_priors.py) + honest noise in the synthetic priors.

Reference behavior to match: registration must survive planar /
lifted-depth scenes (mpsfm/sfm/mapper/registration.py:132-238).
"""

import pytest

import __graft_entry__


@pytest.mark.slow
def test_dryrun_pipeline_8dev_mesh():
    __graft_entry__.dryrun_pipeline(8)
