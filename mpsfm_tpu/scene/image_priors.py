"""Per-image prior state + integration bridge.

Binds Depth/Normals priors and the BiNI solver to an image in the
reconstruction — the TPU equivalent of the reference's Image mixin
(mpsfm/sfm/scene/image/base.py + integration.py): projecting the image's
sparse 3D points into the integration grid, filtering low-parallax
points, fetching z-variances from point covariances, running the solver,
and propagating diag(H⁻¹) uncertainties back to per-keypoint depth
variances.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.config import BaseClass, Config
from mpsfm_tpu.integration.bini import (
    BiniParams,
    Integrator,
    build_integration_inputs,
)
from mpsfm_tpu.scene.priors import Depth, Normals


class ImagePriors(BaseClass):
    """Attached to ImageRecord as `.priors`; `.depth`/`.normals` forwarded."""

    default_conf = {
        "depth": {},
        "normals": {},
        # integration conf (reference scene/image/base.py:30-55):
        "max_iter": 10,
        "tol": 5e-2,
        "cg_max_iter": 1000,
        "cg_tol": 1e-3,
        "lambda1": 1.0,
        "lambda2": 1.0,
        "k": 1.0,
        "depth_magnitude_multiplier": 1.0,
        "normals_magnitude_multiplier": 1.0,
        "downscale_factor": 2,
        "downscaled": True,
        "cov_cg_iters": 150,  # diag(H^-1) indicator solves need less accuracy
        "scale_filter": True,
        "scale_filter_factor": 1.5,
        "robust_triangles": 2,
        "verbose": 0,
    }

    def _propagate_conf(self):
        self.conf.depth = Config.create(Depth.default_conf).merged(self.conf.depth)
        self.conf.normals = Config.create(Normals.default_conf).merged(self.conf.normals)

    def _init(self, rec, imid, depth_dict, normals_dict, mask=None):
        self.rec = rec
        self.imid = imid
        cam = rec.camera(imid)
        int_hw = (cam.int_height, cam.int_width)
        kps = rec.images[imid].keypoints
        self.depth = Depth(self.conf.depth, depth_dict, int_hw, kps=kps, mask=mask)
        self.depth.set_grid_scale(cam.sx, cam.sy)
        self.normals = Normals(
            self.conf.normals,
            normals_dict,
            int_hw,
            mask=mask,
            continuity_mask=self.depth.continuity_mask,
        )
        self.integrator = Integrator(
            BiniParams(
                lambda1=float(self.conf.lambda1),
                lambda2=float(self.conf.lambda2),
                k=float(self.conf.k),
                max_iter=int(self.conf.max_iter),
                cg_max_iter=int(self.conf.cg_max_iter),
                cg_tol=float(self.conf.cg_tol),
                tol=float(self.conf.tol),
            )
        )
        self._last_inputs = None

    # --- sparse anchors (reference _prepare_integration_variables :92-131) ---
    def _sparse_anchors(self):
        rec = self.rec
        imid = self.imid
        cam = rec.camera(imid)
        kp_ids, pids, kps_px, depth3d, ok = rec.project_image_3d_points(imid)
        if not ok or pids is None or len(pids) == 0:
            return None
        pids = np.asarray(pids)
        if self.conf.robust_triangles is not None:
            safe = ~rec.find_points3D_with_small_triangulation_angle(
                self.conf.robust_triangles, pids
            )
            pids, kps_px, depth3d = pids[safe], kps_px[safe], depth3d[safe]
        if len(pids) == 0:
            return None
        grid_px = kps_px * np.array([cam.sx, cam.sy])
        H, W = cam.int_height, cam.int_width
        inb = (
            (grid_px[:, 0] >= 0)
            & (grid_px[:, 0] < W)
            & (grid_px[:, 1] >= 0)
            & (grid_px[:, 1] < H)
        )
        pids, grid_px, depth3d = pids[inb], grid_px[inb], depth3d[inb]
        if len(pids) == 0:
            return None
        zvars = self._point_zvars(pids)
        return grid_px, depth3d, zvars

    def _point_zvars(self, pids):
        """z-variance of points in this camera: (Rᵀ Σ R)[2,2]
        (reference scene/pointcov.py:10-20)."""
        rec = self.rec
        R = rec.images[self.imid].pose.rotation_matrix()
        covs = np.stack(
            [rec.point_covs.get(int(p), np.eye(3) * 1e-2) for p in pids]
        )
        return np.einsum("i,nij,j->n", R[2], covs, R[2]).clip(1e-12, None)

    def _grid_K(self):
        cam = self.rec.camera(self.imid)
        return cam.fx * cam.sx, cam.fy * cam.sy, cam.cx * cam.sx, cam.cy * cam.sy

    def build_inputs(self, downscale=1):
        depth = self.depth
        normals = self.normals
        fx, fy, cx, cy = self._grid_K()
        anchors = self._sparse_anchors()
        kw = {}
        if anchors is not None:
            px, d3, zv = anchors
            kw = dict(sparse_px=px / downscale, sparse_depth=d3, sparse_zvar=zv)
        if downscale > 1:
            from mpsfm_tpu.utils.interp import resize_bilinear

            H, W = depth.data_prior.shape
            hw = (int(H // downscale), int(W // downscale))
            dp = resize_bilinear(depth.data_prior, hw)
            du = resize_bilinear(depth.uncertainty, hw)
            vm = resize_bilinear(depth.valid.astype(np.float64), hw) > 0.5
            nm = normals.data_downscaled
            nc = normals.uncertainty_downscaled
            z_init = resize_bilinear(
                depth.data if (depth.activated and depth.data is not None) else depth.data_prior, hw
            )
            return build_integration_inputs(
                dp, du, vm, nm, nc, fx / downscale, fy / downscale, cx / downscale, cy / downscale,
                z_init=z_init,
                scale_filter=self.conf.scale_filter,
                scale_filter_factor=self.conf.scale_filter_factor,
                depth_magnitude_multiplier=self.conf.depth_magnitude_multiplier,
                normals_magnitude_multiplier=self.conf.normals_magnitude_multiplier,
                **kw,
            )
        z_init = depth.data if (depth.activated and depth.data is not None) else depth.data_prior
        return build_integration_inputs(
            depth.data_prior, depth.uncertainty, depth.valid, normals.data,
            normals.uncertainty, fx, fy, cx, cy,
            z_init=z_init,
            scale_filter=self.conf.scale_filter,
            scale_filter_factor=self.conf.scale_filter_factor,
            depth_magnitude_multiplier=self.conf.depth_magnitude_multiplier,
            normals_magnitude_multiplier=self.conf.normals_magnitude_multiplier,
            **kw,
        )

    def integrate(self, **kw):
        """Refine the working depth map. Returns True when changed
        (reference Image.integrate, integration.py:133-137)."""
        from mpsfm_tpu.utils.profiling import TIMERS

        assert self.rec.images[self.imid].registered and self.depth.activated
        with TIMERS.phase("bini.build_inputs"):
            inputs = self.build_inputs()
        self._last_inputs = inputs
        with TIMERS.phase("bini.integrate1"):
            depth_new, changed = self.integrator.integrate(inputs)
        if changed and depth_new is not None:
            self.depth.data = depth_new
        return changed

    def _int_cov_query(self, pts2d=None):
        """(inputs, rows, cols, K, kps_sel, pts2d, params) for the diag(H⁻¹)
        queries at (a subset of) this image's keypoints on the downscaled
        integration grid."""
        rec = self.rec
        cam = rec.camera(self.imid)
        kps = rec.images[self.imid].keypoints
        if pts2d is None:
            pts2d = np.arange(len(kps))
        kps_sel = kps[pts2d]
        ds = self.conf.downscale_factor if self.conf.downscaled else 1
        inputs = self.build_inputs(downscale=ds)
        params = self.integrator.params._replace(cg_max_iter=int(self.conf.cov_cg_iters))
        gx = np.clip(
            np.round(kps_sel[:, 0] * cam.sx / ds).astype(np.int32), 0, inputs.z0.shape[1] - 1
        )
        gy = np.clip(
            np.round(kps_sel[:, 1] * cam.sy / ds).astype(np.int32), 0, inputs.z0.shape[0] - 1
        )
        return inputs, gy, gx, len(gx), kps_sel, np.asarray(pts2d), params

    def _apply_int_covs(self, varlog, kps_sel, pts2d):
        d_prior = self.depth.data_prior_at_kps(kps_sel)
        var = varlog * d_prior**2  # var(log d) -> var(d)
        for kp, v in zip(pts2d, var):
            self.depth.uncertainty_update[int(kp)] = float(max(v, 1e-12))
        return var

    def calculate_int_covs_at_kps(self, pts2d=None):
        """Propagate diag(H⁻¹) to per-keypoint depth variances
        (reference calculate_int_covs_at_kps, integration.py:604-616)."""
        from mpsfm_tpu.integration.bini import diag_inverse_at_batch, pack_inputs

        inputs, gy, gx, K, kps_sel, pts2d, params = self._int_cov_query(pts2d)
        # pad the query count to a chunk multiple on the host so distinct
        # keypoint counts share one compiled program
        Kp = ((K + 127) // 128) * 128
        rows = np.zeros((1, Kp), np.int32)
        cols = np.zeros((1, Kp), np.int32)
        rows[0, :K], cols[0, :K] = gy, gx
        packed = jnp.asarray(pack_inputs(inputs)[None])
        varlog = np.asarray(diag_inverse_at_batch(packed, params, rows, cols))[0, :K]
        return self._apply_int_covs(varlog, kps_sel, pts2d)


def integrate_bundle_batched(pris) -> dict:
    """Whole-bundle depth refinement in two device calls: one batched
    energy evaluation (the should_refine filter) + one vmapped solve over
    the images that need it (SURVEY §7.1 — replaces the reference's
    per-image loop, mapper/base.py:619-631). Returns {imid: changed}.

    Images are grouped by integration-grid shape + params; each group is
    uploaded as ONE packed (B,11,H,W) array (a single host→device
    transfer — critical on tunneled backends); the refine subset is
    padded to a power-of-two bucket to bound compile variants.
    """
    from mpsfm_tpu.integration.bini import (
        bini_energy_batch_packed,
        bini_solve_batch_packed,
        pack_many,
    )
    from mpsfm_tpu.utils.profiling import TIMERS

    changed: dict = {}
    groups: dict = {}
    with TIMERS.phase("bini.build_inputs"):
        for pri in pris:
            inputs = pri.build_inputs()
            pri._last_inputs = inputs
            key = (inputs.z0.shape, pri.integrator.params)
            groups.setdefault(key, []).append((pri, inputs))

    for (shape, params), entries in groups.items():
        packed = jnp.asarray(pack_many([inp for _, inp in entries]))
        with TIMERS.phase("bini.energy_batch"):
            energies = np.asarray(bini_energy_batch_packed(packed, params))
        todo = [
            k for k, (pri, _) in enumerate(entries)
            if pri.integrator.should_refine_energy(float(energies[k]))
        ]
        for k, (pri, _) in enumerate(entries):
            if k not in todo:
                changed[pri.imid] = False
        if not todo:
            continue
        B = 1
        while B < len(todo):
            B *= 2
        idxs = jnp.asarray(todo + [todo[0]] * (B - len(todo)), jnp.int32)
        sub = packed[idxs]  # device-side gather, no re-upload
        with TIMERS.phase("bini.solve_batch"):
            z, info = bini_solve_batch_packed(sub, params)
            z = np.asarray(z)
        e_arr = np.asarray(info["energy"])
        ab_arr = np.asarray(info["aborted"])
        for pos, k in enumerate(todo):
            pri = entries[k][0]
            depth_new, ch = pri.integrator.accept(z[pos], float(e_arr[pos]), bool(ab_arr[pos]))
            if ch and depth_new is not None:
                pri.depth.data = depth_new
            changed[pri.imid] = ch
    return changed


def int_covs_bundle_batched(pris) -> None:
    """Whole-bundle uncertainty propagation in one device program per
    grid-shape group: packs every image's (downscaled) integration problem
    into a (B,11,h,w) array and runs diag(H⁻¹) indicator solves vmapped
    over the bundle (replaces the reference's per-image cholespy loop,
    integration.py:604-616 called from mapper/base.py)."""
    from mpsfm_tpu.integration.bini import diag_inverse_at_batch, pack_many

    groups: dict = {}
    for pri in pris:
        q = pri._int_cov_query()
        key = (q[0].z0.shape, q[6])
        groups.setdefault(key, []).append((pri, q))

    for (shape, params), entries in groups.items():
        Kmax = max(q[3] for _, q in entries)
        Kp = max(128, ((Kmax + 127) // 128) * 128)
        B = len(entries)
        rows = np.zeros((B, Kp), np.int32)
        cols = np.zeros((B, Kp), np.int32)
        for b, (_, (inputs, gy, gx, K, _, _, _)) in enumerate(entries):
            rows[b, :K], cols[b, :K] = gy, gx
        packed = jnp.asarray(pack_many([q[0] for _, q in entries]))
        varlog = np.asarray(diag_inverse_at_batch(packed, params, rows, cols))
        for b, (pri, (_, _, _, K, kps_sel, pts2d, _)) in enumerate(entries):
            pri._apply_int_covs(varlog[b, :K], kps_sel, pts2d)
