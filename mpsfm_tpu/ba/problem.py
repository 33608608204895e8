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

from mpsfm_tpu.ba.solver import BAData, make_pc_tables, make_slot_tables
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
    dense: object | None = None  # DenseBAData when C*P small (gather-free path)


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

    # --- reprojection observations (camera-major padded layout) ---
    kp_std = float(np.median([rec.images[i].kp_std for i in optim_ids]))
    reproj_mag = 1.0 / kp_std**2
    reproj_scale = reproj_loss_scale_mult * kp_std

    per_cam: dict[int, list] = {c: [] for c in range(len(cam_ids))}
    for p in all_pts:
        for imid, kp in rec.tracks[p]:
            if imid not in cam_local:
                continue
            per_cam[cam_local[imid]].append((pt_local[p], rec.images[imid].keypoints[kp]))

    # --- depth observations (per optim image with activated depth) ---
    per_cam_d: dict[int, list] = {c: [] for c in range(len(cam_ids))}
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
            c = cam_local[imid]
            for k in range(len(depths)):
                per_cam_d[c].append(
                    (
                        pt_local[int(pids[k])],
                        np.log(max(depths[k], 1e-8)),
                        depths[k] ** 2 * inv_unc[k],
                        m * np.sqrt(variances[k]) / depths[k],
                    )
                )

    # --- camera-major padded flat arrays ---
    Cb = _bucket(C, 2)
    Pb = _bucket(max(len(all_pts), 1))
    Sc = _bucket(max([len(v) for v in per_cam.values()] + [1]))
    Sdc = _bucket(max([len(v) for v in per_cam_d.values()] + [1]), 1)
    No = Cb * Sc
    Nd = Cb * Sdc

    r_cam = np.zeros(No, np.int32)
    r_pt = np.zeros(No, np.int32)
    r_uv = np.zeros((No, 2), dtype)
    r_valid = np.zeros(No, np.float32)
    d_cam = np.zeros(Nd, np.int32)
    d_pt = np.zeros(Nd, np.int32)
    d_log = np.zeros(Nd, dtype)
    d_mag_arr = np.zeros(Nd, dtype)
    d_scale_arr = np.ones(Nd, dtype)
    d_valid = np.zeros(Nd, np.float32)
    for c in range(Cb):
        base = c * Sc
        r_cam[base : base + Sc] = min(c, C - 1) if C else 0
        obs = sorted(per_cam.get(c, []), key=lambda o: o[0])  # point-sorted
        for k, (pl, uv) in enumerate(obs):
            r_pt[base + k] = pl
            r_uv[base + k] = uv
            r_valid[base + k] = 1.0
        based = c * Sdc
        d_cam[based : based + Sdc] = min(c, C - 1) if C else 0
        dobs = sorted(per_cam_d.get(c, []), key=lambda o: o[0])
        for k, (pl, lg, mg, sc_) in enumerate(dobs):
            d_pt[based + k] = pl
            d_log[based + k] = lg
            d_mag_arr[based + k] = mg
            d_scale_arr[based + k] = sc_
            d_valid[based + k] = 1.0
    r_cam = np.minimum(np.arange(No, dtype=np.int32) // Sc, Cb - 1)
    d_cam = np.minimum(np.arange(Nd, dtype=np.int32) // Sdc, Cb - 1)

    r_pt_slots, r_pt_mask = make_slot_tables(r_pt[r_valid > 0], Pb)
    # remap slot indices back to padded positions
    valid_pos = np.where(r_valid > 0)[0]
    r_pt_slots = valid_pos[r_pt_slots].astype(np.int32) if len(valid_pos) else r_pt_slots
    dvalid_pos = np.where(d_valid > 0)[0]
    d_pt_slots, d_pt_mask = make_slot_tables(d_pt[d_valid > 0], Pb)
    d_pt_slots = dvalid_pos[d_pt_slots].astype(np.int32) if len(dvalid_pos) else d_pt_slots

    # Per-(point,camera) coupling tables for the dense-Schur path; skipped
    # when the (Pb, Cb, 6, 3) T tensor would be too large (PCG path then).
    pc = {}
    if Pb * Cb <= 8_000_000:
        pc_r_slot, pc_r_mask = make_pc_tables(r_pt, r_valid, Pb, Cb, Sc)
        pc_d_slot, pc_d_mask = make_pc_tables(d_pt, d_valid, Pb, Cb, Sdc)
        if pc_r_slot is not None and pc_d_slot is not None:
            pc = dict(
                pc_r_slot=jnp.asarray(pc_r_slot),
                pc_r_mask=jnp.asarray(pc_r_mask),
                pc_d_slot=jnp.asarray(pc_d_slot),
                pc_d_mask=jnp.asarray(pc_d_mask),
            )

    quat_p = _pad_to(quat, Cb)
    quat_p[C:, 0] = 1.0  # identity quats for padded cameras (zero NaNs normalize)
    data = BAData(
        quat=jnp.asarray(quat_p),
        t=jnp.asarray(_pad_to(t, Cb)),
        cam_dof=jnp.asarray(_pad_to(cam_dof, Cb)),
        fx=jnp.asarray(_pad_to(fx, Cb, 1)),
        fy=jnp.asarray(_pad_to(fy, Cb, 1)),
        cx=jnp.asarray(_pad_to(cx, Cb)),
        cy=jnp.asarray(_pad_to(cy, Cb)),
        xyz=jnp.asarray(_pad_to(xyz, Pb)),
        point_var=jnp.asarray(_pad_to(point_var, Pb)),
        r_cam=jnp.asarray(r_cam),
        r_pt=jnp.asarray(r_pt),
        r_uv=jnp.asarray(r_uv),
        r_valid=jnp.asarray(r_valid),
        r_mag=jnp.asarray(np.full(No, reproj_mag, dtype)),
        r_scale=jnp.asarray(np.full(No, reproj_scale, dtype)),
        d_cam=jnp.asarray(d_cam),
        d_pt=jnp.asarray(d_pt),
        d_logtarget=jnp.asarray(d_log),
        d_valid=jnp.asarray(d_valid),
        d_mag=jnp.asarray(d_mag_arr),
        d_scale=jnp.asarray(d_scale_arr),
        r_pt_slots=jnp.asarray(r_pt_slots),
        r_pt_slot_mask=jnp.asarray(r_pt_mask),
        d_pt_slots=jnp.asarray(d_pt_slots),
        d_pt_slot_mask=jnp.asarray(d_pt_mask),
        **pc,
    )
    dense = None
    if Pb * Cb <= 8_000_000:
        from mpsfm_tpu.ba.dense import DenseBAData

        uv_g = np.zeros((Cb, Pb, 2), dtype)
        rw_g = np.zeros((Cb, Pb), dtype)
        rs_g = np.ones((Cb, Pb), dtype)
        v = r_valid > 0
        uv_g[r_cam[v], r_pt[v]] = r_uv[v]
        rw_g[r_cam[v], r_pt[v]] = reproj_mag
        rs_g[r_cam[v], r_pt[v]] = reproj_scale
        dl_g = np.zeros((Cb, Pb), dtype)
        dw_g = np.zeros((Cb, Pb), dtype)
        ds_g = np.ones((Cb, Pb), dtype)
        vd = d_valid > 0
        dl_g[d_cam[vd], d_pt[vd]] = d_log[vd]
        dw_g[d_cam[vd], d_pt[vd]] = d_mag_arr[vd]
        ds_g[d_cam[vd], d_pt[vd]] = d_scale_arr[vd]
        dense = DenseBAData(
            quat=data.quat, t=data.t, cam_dof=data.cam_dof,
            fx=data.fx, fy=data.fy, cx=data.cx, cy=data.cy,
            xyz=data.xyz, point_var=data.point_var,
            uv=jnp.asarray(uv_g), r_w=jnp.asarray(rw_g), r_scale=jnp.asarray(rs_g),
            d_logt=jnp.asarray(dl_g), d_w=jnp.asarray(dw_g), d_scale=jnp.asarray(ds_g),
        )
    return BAProblem(
        data=data, cam_ids=cam_ids, pt_ids=np.asarray(all_pts, np.int64),
        n_cams=C, n_pts=len(all_pts), dense=dense,
    )


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
