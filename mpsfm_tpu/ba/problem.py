"""Host-side BA problem construction from the Reconstruction.

Mirrors the reference Optimizer's problem setup
(mpsfm/sfm/mapper/bundle_adjustment.py:67-185): bundle image set, local
vs global point variability (track<15 rule), gauge fixing (first pose
constant, second pose tx frozen), constant intrinsics, median-kp_std loss
scaling, and per-observation depth residual weighting (magnitude d²/σ²,
robust scale m·σ/d, optional scale filter and gross-outlier rejection).
Produces padded BAData device arrays + the index mapping to write results
back into the Reconstruction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from mpsfm_tpu.ba.solver import BAData
from mpsfm_tpu.scene.reconstruction import Reconstruction


def _pad_to(arr, n, fill=0):
    out = np.full((n, *arr.shape[1:]), fill, arr.dtype)
    out[: len(arr)] = arr
    return out


def _bucket(n, minimum=16):
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class BAProblem:
    data: BAData
    cam_ids: list  # local cam index -> imid
    pt_ids: np.ndarray  # local point index -> pid
    n_cams: int
    n_pts: int


def build_ba_data(
    rec: Reconstruction,
    bundle: dict,
    mode: str = "global",
    fix_pose: bool = False,
    reproj_loss_scale_mult: float = 1.5,
    depth_rob_scale: float = 2.0,  # rob_std
    param_multiplier: float = 1.0,
    truncation_multiplier: float = 1.0,
    depth_type: str = "update",
    allow_scale_filter: bool = False,
    scale_filter_factor: float = 1.5,
    use_depth: bool = True,
    local_variable_track_max: int = 15,
    dtype=np.float32,
) -> BAProblem:
    optim_ids = sorted(bundle["optim_ids"])
    pts3D = set(int(p) for p in bundle.get("pts3D", set()))
    constpoints = set(int(p) for p in bundle.get("constpoints", set()))

    # --- involved points and their variability ---
    all_pts = sorted(pts3D | constpoints)
    all_pts = [p for p in all_pts if rec.alive[p]]
    pt_local = {p: i for i, p in enumerate(all_pts)}
    point_var = np.zeros(len(all_pts), np.float32)
    for p in all_pts:
        if p in constpoints:
            continue
        if mode == "local" and rec.track_len[p] >= local_variable_track_max:
            continue
        point_var[pt_local[p]] = 1.0

    # --- involved cameras: optim images (variable) + other observers (const) ---
    observer_ids = set()
    for p in all_pts:
        for imid, _ in rec.tracks[p]:
            if rec.images[imid].registered:
                observer_ids.add(imid)
    cam_ids = list(optim_ids) + sorted(observer_ids - set(optim_ids))
    cam_local = {imid: i for i, imid in enumerate(cam_ids)}

    C = len(cam_ids)
    cam_dof = np.zeros((C, 6), np.float32)
    for ii, imid in enumerate(optim_ids):
        if fix_pose or ii == 0:
            continue
        cam_dof[ii] = 1.0
        if ii == 1:
            cam_dof[ii, 3] = 0.0  # freeze tx of the second pose (gauge scale)

    quat = np.stack([rec.images[i].pose.q for i in cam_ids]).astype(dtype)
    t = np.stack([rec.images[i].pose.t for i in cam_ids]).astype(dtype)
    fx = np.array([rec.camera(i).fx for i in cam_ids], dtype)
    fy = np.array([rec.camera(i).fy for i in cam_ids], dtype)
    cx = np.array([rec.camera(i).cx for i in cam_ids], dtype)
    cy = np.array([rec.camera(i).cy for i in cam_ids], dtype)
    xyz = rec.xyz[all_pts].astype(dtype) if all_pts else np.zeros((0, 3), dtype)

    # --- reprojection observations ---
    kp_std = float(np.median([rec.images[i].kp_std for i in optim_ids]))
    reproj_mag = 1.0 / kp_std**2
    reproj_scale = reproj_loss_scale_mult * kp_std

    r_cam, r_pt, r_uv = [], [], []
    for p in all_pts:
        for imid, kp in rec.tracks[p]:
            if imid not in cam_local:
                continue
            r_cam.append(cam_local[imid])
            r_pt.append(pt_local[p])
            r_uv.append(rec.images[imid].keypoints[kp])
    r_cam = np.asarray(r_cam, np.int32)
    r_pt = np.asarray(r_pt, np.int32)
    r_uv = np.asarray(r_uv, dtype).reshape(-1, 2) if len(r_uv) else np.zeros((0, 2), dtype)

    # --- depth observations (per optim image with activated depth) ---
    d_cam, d_pt, d_log, d_mag, d_scale = [], [], [], [], []
    if use_depth:
        m = param_multiplier * truncation_multiplier * depth_rob_scale
        for imid in optim_ids:
            im = rec.images[imid]
            depth = getattr(im, "depth", None)
            if depth is None or not depth.activated:
                continue
            kp_ids = im.observed_kp_ids()
            if len(kp_ids) == 0:
                continue
            kps = im.keypoints[kp_ids]
            valid = depth.valid_at_kps(kps)
            kp_ids = kp_ids[valid]
            kps = kps[valid]
            if len(kp_ids) == 0:
                continue
            if depth_type == "update" and depth.data is not None:
                depths = depth.data_at_kps(kps)
            else:
                depths = depth.data_prior_at_kps(kps)
            pids = im.point3D_ids[kp_ids]
            _, z = rec.project_points_into_image(imid, pids)
            mask = depths > 0
            if allow_scale_filter:
                div = depths / np.clip(z, 1e-6, None)
                mask &= (div < scale_filter_factor) & (div > 1 / scale_filter_factor)
            variances = np.array([depth.uncertainty_update[kp] for kp in kp_ids])
            if mask.sum() == 0:
                continue
            depths, variances, pids = depths[mask], variances[mask], pids[mask]
            inv_unc = 1.0 / np.clip(variances, 1e-6, None)
            for k in range(len(depths)):
                d_cam.append(cam_local[imid])
                d_pt.append(pt_local[int(pids[k])])
                d_log.append(np.log(max(depths[k], 1e-8)))
                d_mag.append(depths[k] ** 2 * inv_unc[k])
                d_scale.append(m * np.sqrt(variances[k]) / depths[k])
    d_cam = np.asarray(d_cam, np.int32)
    d_pt = np.asarray(d_pt, np.int32)

    # --- pad to buckets ---
    Cb = _bucket(C, 2)
    Pb = _bucket(max(len(all_pts), 1))
    Nob = _bucket(max(len(r_cam), 1))
    Ndb = _bucket(max(len(d_cam), 1), 1)

    data = BAData(
        quat=jnp.asarray(_pad_to(quat, Cb)),
        t=jnp.asarray(_pad_to(t, Cb)),
        cam_dof=jnp.asarray(_pad_to(cam_dof, Cb)),
        fx=jnp.asarray(_pad_to(fx, Cb, 1)),
        fy=jnp.asarray(_pad_to(fy, Cb, 1)),
        cx=jnp.asarray(_pad_to(cx, Cb)),
        cy=jnp.asarray(_pad_to(cy, Cb)),
        xyz=jnp.asarray(_pad_to(xyz, Pb)),
        point_var=jnp.asarray(_pad_to(point_var, Pb)),
        r_cam=jnp.asarray(_pad_to(r_cam, Nob)),
        r_pt=jnp.asarray(_pad_to(r_pt, Nob)),
        r_uv=jnp.asarray(_pad_to(r_uv, Nob)),
        r_valid=jnp.asarray(_pad_to(np.ones(len(r_cam), np.float32), Nob)),
        r_mag=jnp.asarray(np.full(Nob, reproj_mag, dtype)),
        r_scale=jnp.asarray(np.full(Nob, reproj_scale, dtype)),
        d_cam=jnp.asarray(_pad_to(d_cam, Ndb)),
        d_pt=jnp.asarray(_pad_to(d_pt, Ndb)),
        d_logtarget=jnp.asarray(_pad_to(np.asarray(d_log, dtype), Ndb)),
        d_valid=jnp.asarray(_pad_to(np.ones(len(d_cam), np.float32), Ndb)),
        d_mag=jnp.asarray(_pad_to(np.asarray(d_mag, dtype), Ndb)),
        d_scale=jnp.asarray(_pad_to(np.asarray(d_scale, dtype), Ndb, 1)),
    )
    return BAProblem(data=data, cam_ids=cam_ids, pt_ids=np.asarray(all_pts, np.int64), n_cams=C, n_pts=len(all_pts))


def apply_ba_result(rec: Reconstruction, problem: BAProblem, quat, t, xyz):
    """Write optimized poses/points back into the Reconstruction."""
    quat = np.asarray(quat, np.float64)
    t = np.asarray(t, np.float64)
    xyz = np.asarray(xyz, np.float64)
    for i, imid in enumerate(problem.cam_ids):
        pose = rec.images[imid].pose
        pose.q = quat[i] / np.linalg.norm(quat[i])
        pose.t = t[i]
    if len(problem.pt_ids):
        rec.xyz[problem.pt_ids] = xyz[: problem.n_pts]
