"""Fixed-budget batched RANSAC harnesses (JAX).

The reference relies on COLMAP's adaptive LO-RANSAC (C++, data-dependent
trial counts and early exit — e.g. 20k-trial two-view verification,
mpsfm/sfm/scene/correspondences/utils.py:27-33). On TPU, data-dependent
control flow defeats XLA, so these harnesses draw a *fixed* budget of
hypotheses, solve all minimal problems batched via vmap, score all
hypotheses against all (masked) correspondences with one large einsum-like
pass, and locally optimize the winner on its inliers. Host wrappers pad
inputs to shape buckets so jit caches are reused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpsfm_tpu.estimators.essential import (
    decompose_essential,
    essential_from_eight_points,
    sampson_error_sq,
)
from mpsfm_tpu.estimators.homography import (
    homography_from_four_points,
    homography_transfer_error_sq,
)
from mpsfm_tpu.estimators.pnp import (
    pnp_from_plane,
    pnp_from_six_points,
    refine_pose_gn,
    reprojection_residuals,
)
from mpsfm_tpu.geometry.rotations import Rigid3d


def _sample_indices(key, num_hyp, sample_size, n, valid_mask):
    """(num_hyp, sample_size) index samples drawn from valid entries."""
    p = valid_mask.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    keys = jax.random.split(key, num_hyp)

    def one(k):
        return jax.random.choice(k, n, shape=(sample_size,), replace=False, p=p)

    return jax.vmap(one)(keys)


@partial(jax.jit, static_argnames=("num_hyp",))
def ransac_essential(key, xy1_norm, xy2_norm, valid_mask, thresh_sq, num_hyp: int = 512):
    """Essential-matrix RANSAC on normalized coords.

    Args:
      xy1_norm, xy2_norm: (N,2) normalized image coords (padded).
      valid_mask: (N,) bool — False for padding.
      thresh_sq: squared Sampson threshold in normalized units
        (max_error_px^2 / (fx*fy) per COLMAP convention).
      num_hyp: fixed hypothesis budget.

    Returns dict with E, pose (cam2_from_cam1, unit baseline), inlier_mask,
    num_inliers.
    """
    n = xy1_norm.shape[0]
    idx = _sample_indices(key, num_hyp, 8, n, valid_mask)
    s1 = xy1_norm[idx]  # (H,8,2)
    s2 = xy2_norm[idx]

    Es = jax.vmap(lambda a, b: essential_from_eight_points(a, b, minimal=True))(s1, s2)
    errs = sampson_error_sq(Es, xy1_norm[None], xy2_norm[None])  # (H,N)
    inl = (errs < thresh_sq) & valid_mask[None]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    E0 = Es[best]
    inl0 = inl[best]

    # Local optimization: refit on inliers with the full (masked) 8-point.
    E1 = essential_from_eight_points(xy1_norm, xy2_norm, inl0)
    err1 = sampson_error_sq(E1, xy1_norm, xy2_norm)
    inl1 = (err1 < thresh_sq) & valid_mask
    better = inl1.sum() >= inl0.sum()
    E = jnp.where(better, E1, E0)
    inlier_mask = jnp.where(better, inl1, inl0)

    pose, votes, _ = decompose_essential(E, xy1_norm, xy2_norm, inlier_mask)
    return {
        "E": E,
        "pose": pose,
        "inlier_mask": inlier_mask,
        "num_inliers": inlier_mask.sum(),
        "cheirality_votes": votes,
    }


@partial(jax.jit, static_argnames=("num_hyp",))
def ransac_homography(key, xy1_norm, xy2_norm, valid_mask, thresh_sq, num_hyp: int = 512):
    """Homography RANSAC (forward transfer error)."""
    n = xy1_norm.shape[0]
    idx = _sample_indices(key, num_hyp, 4, n, valid_mask)
    Hs = jax.vmap(lambda a, b: homography_from_four_points(a, b, minimal=True))(
        xy1_norm[idx], xy2_norm[idx]
    )
    errs = homography_transfer_error_sq(Hs, xy1_norm[None], xy2_norm[None])
    inl = (errs < thresh_sq) & valid_mask[None]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    H0, inl0 = Hs[best], inl[best]
    H1 = homography_from_four_points(xy1_norm, xy2_norm, inl0)
    err1 = homography_transfer_error_sq(H1, xy1_norm, xy2_norm)
    inl1 = (err1 < thresh_sq) & valid_mask
    better = inl1.sum() >= inl0.sum()
    return {
        "H": jnp.where(better, H1, H0),
        "inlier_mask": jnp.where(better, inl1, inl0),
        "num_inliers": jnp.maximum(inl1.sum(), inl0.sum()),
    }


@partial(jax.jit, static_argnames=("num_hyp", "refine_iters"))
def ransac_pnp(
    key,
    xyz,
    xy_norm,
    valid_mask,
    thresh_sq,
    num_hyp: int = 512,
    refine_iters: int = 10,
):
    """Absolute-pose RANSAC + Gauss-Newton refinement on inliers.

    Replaces pycolmap.estimate_and_refine_absolute_pose
    (reference: mpsfm/sfm/estimators/absolute_pose.py:8-25).

    Args:
      xyz: (N,3) world points; xy_norm: (N,2) normalized image coords.
      thresh_sq: squared reprojection threshold in *normalized* units.
    Returns dict with pose (cam_from_world), inlier_mask, num_inliers.
    """
    n = xyz.shape[0]
    idx = _sample_indices(key, num_hyp, 6, n, valid_mask)

    # two hypothesis families per sample: the 6-pt DLT (general position)
    # and the homography-based planar solver — lifted-depth clouds are
    # often near-exactly coplanar (integrated surfaces), where the DLT
    # nullspace is 4-D and its smallest-vector solution returns ~0
    # inliers; the scoring pass picks whichever family fits
    poses_dlt = jax.vmap(lambda a, b: pnp_from_six_points(a, b, minimal=True))(
        xyz[idx], xy_norm[idx]
    )
    poses_pl = jax.vmap(pnp_from_plane)(xyz[idx], xy_norm[idx])
    poses = Rigid3d(
        jnp.concatenate([poses_dlt.quat, poses_pl.quat]),
        jnp.concatenate([poses_dlt.t, poses_pl.t]),
    )

    def errs_for(pose):
        r = reprojection_residuals(pose, xyz, xy_norm)
        depth_ok = _depths(pose, xyz) > 0
        e = (r**2).sum(-1)
        return jnp.where(depth_ok, e, jnp.inf)

    errs = jax.vmap(errs_for)(poses)  # (H,N)
    finite = jnp.isfinite(errs)
    inl = finite & (errs < thresh_sq) & valid_mask[None]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    pose0 = Rigid3d(poses.quat[best], poses.t[best])
    inl0 = inl[best]

    pose = refine_pose_gn(pose0, xyz, xy_norm, inl0.astype(xyz.dtype), iters=refine_iters)
    err1 = errs_for(pose)
    inl1 = (err1 < thresh_sq) & valid_mask
    better = inl1.sum() >= inl0.sum()
    pose = Rigid3d(
        jnp.where(better, pose.quat, pose0.quat), jnp.where(better, pose.t, pose0.t)
    )
    inlier_mask = jnp.where(better, inl1, inl0)
    # Second refinement round on the updated inlier set.
    pose = refine_pose_gn(pose, xyz, xy_norm, inlier_mask.astype(xyz.dtype), iters=refine_iters)
    err2 = errs_for(pose)
    inl2 = (err2 < thresh_sq) & valid_mask
    return {
        "pose": pose,
        "inlier_mask": inl2,
        "num_inliers": inl2.sum(),
    }


def _depths(pose: Rigid3d, xyz):
    from mpsfm_tpu.geometry.triangulation import point_depth

    return point_depth(pose, xyz)
