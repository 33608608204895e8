import numpy as np
import pytest

from mpsfm_tpu.mapper.image_selection import ImageSelection
from mpsfm_tpu.scene.correspondences import Correspondences

from synthetic import PlaneScene


@pytest.fixture()
def setup(rng):
    scene = PlaneScene(rng=rng, n_images=5, n_points=200, point_jitter=0.3)
    rec, keypoints, matches, gt = scene.build(with_priors=False)
    corr = Correspondences({"num_hyp": 256}, rec)
    corr.populate(keypoints, matches)
    # register 0,1 and triangulate points shared by them
    for i in (0, 1):
        rec.images[i].pose = gt["poses"][i]
        rec.images[i].registered = True
    m = corr.matches(0, 1)
    for k in range(0, len(m), 2):
        kp0, kp1 = int(m[k, 0]), int(m[k, 1])
        if rec.images[0].point3D_ids[kp0] >= 0:
            continue
        rec.add_point3D(gt["points"][k % 200] * 0 + [0, 0, 5.0], [(0, kp0), (1, kp1)])
    return rec, corr


@pytest.mark.parametrize(
    "method",
    [
        "MAX_MATCHER_INLIER_SCORES",
        "MAX_NUM_INLIER_SCORES_TOT",
        "MAX_VISIBLE_POINTS_NUM",
        "MAX_VISIBLE_POINTS_RATIO",
        "MIN_UNCERTAINTY",
        "MAX_NUM_CORRESPONDENCES",
        "MAX_NUM_INLIER_CORRESPONDENCES",
        "MAX_NUM_INLIER_CORRESPONDENCES_TOT",
    ],
)
def test_all_selection_methods(setup, method):
    rec, corr = setup
    sel = ImageSelection({"image_selection_method": method}, rec, corr)
    ok = sel.next_image()
    assert ok
    assert sel.candid in (2, 3, 4)
    out = sel.rank_image(sel.candid)
    assert out["score"] > 0
    assert out["refid"] in (0, 1)


def test_unknown_method_raises(setup):
    rec, corr = setup
    sel = ImageSelection({"image_selection_method": "BOGUS"}, rec, corr)
    with pytest.raises(ValueError):
        sel.rank_image(2)
