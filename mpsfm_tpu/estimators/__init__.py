from mpsfm_tpu.estimators.essential import (
    essential_from_eight_points,
    decompose_essential,
    sampson_error_sq,
)
from mpsfm_tpu.estimators.ransac import ransac_essential, ransac_pnp, ransac_homography
from mpsfm_tpu.estimators.two_view import TwoViewConfig, estimate_two_view_geometry

__all__ = [
    "essential_from_eight_points",
    "decompose_essential",
    "sampson_error_sq",
    "ransac_essential",
    "ransac_pnp",
    "ransac_homography",
    "TwoViewConfig",
    "estimate_two_view_geometry",
]
