"""Two-view geometry estimation + classification, batched over pairs (JAX).

TPU-native replacement for pycolmap.estimate_calibrated_two_view_geometry
as used in the reference's geometric verification
(mpsfm/sfm/scene/correspondences/utils.py:13-78): estimates essential and
homography models, classifies the pair (CALIBRATED vs PLANAR_OR_PANORAMIC
vs DEGENERATE), recovers the relative pose, and reports inliers and the
median triangulation angle. Instead of a process pool fanning out C++
RANSACs, all pairs are verified in one batched device program.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.estimators.essential import decompose_essential, essential_from_eight_points, sampson_error_sq
from mpsfm_tpu.estimators.ransac import ransac_essential, ransac_homography
from mpsfm_tpu.geometry.projection import Camera, cam_from_img
from mpsfm_tpu.geometry.rotations import Rigid3d
from mpsfm_tpu.geometry.triangulation import pair_triangulation_angle, triangulate_two_view


class TwoViewConfig(enum.IntEnum):
    """COLMAP-compatible two-view configuration classes (SURVEY.md §2:
    init-pair search ranks configs 2..8)."""

    UNDEFINED = 0
    DEGENERATE = 1
    CALIBRATED = 2
    UNCALIBRATED = 3
    PLANAR = 4
    PANORAMIC = 5
    PLANAR_OR_PANORAMIC = 6
    WATERMARK = 7
    MULTIPLE = 8


# COLMAP defaults for two-view geometry classification.
MIN_NUM_INLIERS = 15
MAX_H_INLIER_RATIO = 0.8


@partial(jax.jit, static_argnames=("num_hyp",))
def _estimate_pair(key, xy1n, xy2n, valid, e_thresh_sq, h_thresh_sq, num_hyp: int = 512):
    kE, kH = jax.random.split(key)
    out_e = ransac_essential(kE, xy1n, xy2n, valid, e_thresh_sq, num_hyp=num_hyp)
    out_h = ransac_homography(kH, xy1n, xy2n, valid, h_thresh_sq, num_hyp=num_hyp)

    # Median triangulation angle over essential inliers.
    pose1 = Rigid3d.identity(dtype=xy1n.dtype)
    pose2 = out_e["pose"]
    n = xy1n.shape[0]
    X = triangulate_two_view(
        Rigid3d(jnp.broadcast_to(pose1.quat, (n, 4)), jnp.broadcast_to(pose1.t, (n, 3))),
        Rigid3d(jnp.broadcast_to(pose2.quat, (n, 4)), jnp.broadcast_to(pose2.t, (n, 3))),
        xy1n,
        xy2n,
    )
    ang = pair_triangulation_angle(pose1, pose2, X)
    ang_sorted = jnp.sort(jnp.where(out_e["inlier_mask"], ang, jnp.inf))
    k = jnp.maximum(out_e["num_inliers"], 1)
    median_ang = ang_sorted[jnp.clip((k - 1) // 2, 0, n - 1)]

    num_e = out_e["num_inliers"]
    num_h = out_h["num_inliers"]
    degenerate = num_e < MIN_NUM_INLIERS
    planar = (num_h.astype(jnp.float32) > MAX_H_INLIER_RATIO * num_e.astype(jnp.float32)) & ~degenerate
    config = jnp.where(
        degenerate,
        jnp.int32(TwoViewConfig.DEGENERATE),
        jnp.where(planar, jnp.int32(TwoViewConfig.PLANAR_OR_PANORAMIC), jnp.int32(TwoViewConfig.CALIBRATED)),
    )
    return {
        "config": config,
        "num_inliers": num_e,
        "num_h_inliers": num_h,
        "inlier_mask": out_e["inlier_mask"],
        "pose": out_e["pose"],
        "tri_angle": median_ang,
        "E": out_e["E"],
    }


_estimate_pairs_batch = jax.jit(
    jax.vmap(_estimate_pair, in_axes=(0, 0, 0, 0, 0, 0)), static_argnames=("num_hyp",)
)


class TwoViewGeometry:
    """Host-side result of two-view verification for one pair."""

    __slots__ = ["config", "inlier_matches", "pose", "tri_angle", "E", "num_inliers"]

    def __init__(self, config, inlier_matches, pose, tri_angle, E, num_inliers):
        self.config = TwoViewConfig(int(config))
        self.inlier_matches = inlier_matches  # (M,2) int array of kp index pairs
        self.pose = pose  # cam2_from_cam1 (Rigid3d of numpy arrays), unit baseline
        self.tri_angle = float(tri_angle)
        self.E = E
        self.num_inliers = int(num_inliers)

    def invert(self):
        from mpsfm_tpu.geometry.rotations import quat_conj, quat_rotate

        q = np.asarray(self.pose.quat)
        t = np.asarray(self.pose.t)
        qinv = q * np.array([1.0, -1, -1, -1])
        tinv = -np.asarray(quat_rotate(jnp.asarray(qinv), jnp.asarray(t)))
        return TwoViewGeometry(
            self.config,
            self.inlier_matches[:, ::-1],
            Rigid3d(qinv, tinv),
            self.tri_angle,
            self.E.T if self.E is not None else None,
            self.num_inliers,
        )


def _next_bucket(n, minimum=64):
    b = minimum
    while b < n:
        b *= 2
    return b


def estimate_two_view_geometry(
    cam1: Camera,
    cam2: Camera,
    kps1: np.ndarray,
    kps2: np.ndarray,
    matches: np.ndarray,
    max_error_px: float = 4.0,
    num_hyp: int = 512,
    seed: int = 0,
) -> TwoViewGeometry:
    """Single-pair host API (pads and calls the batched kernel)."""
    out = estimate_two_view_geometry_batch(
        [(cam1, cam2, kps1, kps2, matches)], max_error_px=max_error_px, num_hyp=num_hyp, seed=seed
    )
    return out[0]


def estimate_two_view_geometry_batch(
    pairs, max_error_px: float = 4.0, num_hyp: int = 512, seed: int = 0
):
    """Verify many pairs in bucketed batched device calls.

    pairs: list of (cam1, cam2, kps1 (N1,2) px, kps2, matches (M,2) int).
    Returns a list of TwoViewGeometry. Pairs are grouped into match-count
    buckets (powers of two) so each bucket is one vmapped jit call.
    """
    results: list = [None] * len(pairs)
    buckets: dict = {}
    for i, (cam1, cam2, kps1, kps2, matches) in enumerate(pairs):
        m = len(matches)
        if m < 8:
            results[i] = TwoViewGeometry(
                TwoViewConfig.DEGENERATE, np.zeros((0, 2), np.int64), Rigid3d.identity(), 0.0, None, 0
            )
            continue
        buckets.setdefault(_next_bucket(m), []).append(i)

    for bucket, idxs in buckets.items():
        xy1 = np.zeros((len(idxs), bucket, 2), np.float32)
        xy2 = np.zeros((len(idxs), bucket, 2), np.float32)
        valid = np.zeros((len(idxs), bucket), bool)
        e_thr = np.zeros((len(idxs),), np.float32)
        h_thr = np.zeros((len(idxs),), np.float32)
        for j, i in enumerate(idxs):
            cam1, cam2, kps1, kps2, matches = pairs[i]
            m = len(matches)
            p1 = kps1[matches[:, 0]]
            p2 = kps2[matches[:, 1]]
            # host numpy normalization — an eager jnp cam_from_img here is
            # a per-pair device round-trip (~0.5-1 s each on the tunnel;
            # was ~96 s per populate on the 66-pair bench scene)
            c1x, c1y = float(cam1.cx), float(cam1.cy)
            c2x, c2y = float(cam2.cx), float(cam2.cy)
            xy1[j, :m, 0] = (p1[:, 0] - c1x) / float(cam1.fx)
            xy1[j, :m, 1] = (p1[:, 1] - c1y) / float(cam1.fy)
            xy2[j, :m, 0] = (p2[:, 0] - c2x) / float(cam2.fx)
            xy2[j, :m, 1] = (p2[:, 1] - c2y) / float(cam2.fy)
            valid[j, :m] = True
            f1 = 0.5 * (float(cam1.fx) + float(cam1.fy))
            f2 = 0.5 * (float(cam2.fx) + float(cam2.fy))
            # px threshold -> normalized units (mean of the two cameras).
            thr_n = 0.5 * (max_error_px / f1 + max_error_px / f2)
            e_thr[j] = thr_n**2
            h_thr[j] = thr_n**2
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            jax.random.PRNGKey(seed), jnp.arange(len(idxs))
        )
        out = _estimate_pairs_batch(
            keys,
            jnp.asarray(xy1),
            jnp.asarray(xy2),
            jnp.asarray(valid),
            jnp.asarray(e_thr),
            jnp.asarray(h_thr),
        )
        out = jax.tree.map(np.asarray, out)
        for j, i in enumerate(idxs):
            matches = pairs[i][4]
            mask = out["inlier_mask"][j][: len(matches)]
            results[i] = TwoViewGeometry(
                out["config"][j],
                np.asarray(matches)[mask],
                Rigid3d(out["pose"].quat[j], out["pose"].t[j]),
                np.rad2deg(out["tri_angle"][j]),
                out["E"][j],
                out["num_inliers"][j],
            )
    return results
