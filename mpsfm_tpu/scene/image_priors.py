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

import jax
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
        "cov_cg_iters": 16,  # deflated PCG: ~1% diag err at 10 iters (bini.py)
        # Relative floor on the int_covs posterior depth std (fraction of
        # prior depth). Deviation from the reference (which applies
        # diag(H⁻¹) unfloored, integration.py:604-616): the integration
        # posterior assumes per-pixel-INDEPENDENT prior noise, so whole-
        # image averaging drives the posterior level variance toward
        # var_prior/N_pixels. Real metric-depth priors carry CORRELATED
        # scale/bias error that averaging cannot remove; an unfloored
        # posterior whitens those residuals at O(√N)·σ and the stiff
        # depth terms then tear the map apart in trivial-loss point
        # refinement (diagnosed on the planar multichip dryrun scene).
        "int_cov_rel_floor": 0.01,
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
        # Device-side transport caches, keyed by downscale factor: the
        # static rows (normals-derived), prior rows (depth-prior-derived,
        # keyed by Depth.version), and the working log-depth z0 (keyed by
        # Depth.data_epoch, moved by a scalar log-shift under rescales)
        # stay resident on device; per call only the sparse anchor rows
        # (~KB) travel through the tunnel.
        self._static6_cache: dict = {}
        self._prior_cache: dict = {}
        self._packed_dev: dict = {}
        self._z0_cache: dict = {}

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
        return grid_px, depth3d, pids

    def _point_zvars(self, pids):
        """z-variance of points in this camera: (Rᵀ Σ R)[2,2]
        (reference scene/pointcov.py:10-20)."""
        rec = self.rec
        R = rec.images[self.imid].pose.rotation_matrix()
        covs = np.stack(
            [rec.point_covs.get(int(p), np.eye(3) * 1e-2) for p in pids]
        )
        return np.einsum("i,nij,j->n", R[2], covs, R[2]).clip(1e-12, None)

    def _R2(self):
        """Third world->cam rotation row for device-side z-variance; [0,0,1]
        when the image has no pose yet (anchors then carry host codes)."""
        pose = self.rec.images[self.imid].pose
        if pose is None:
            return np.array([0.0, 0.0, 1.0])
        return pose.rotation_matrix()[2]

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
            px, d3, pids = anchors
            zv = self._point_zvars(pids)
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

    # --- device-resident packed transport ---
    def _hw(self, downscale):
        H, W = self.depth.data_prior.shape
        return (int(H // downscale), int(W // downscale)) if downscale > 1 else (H, W)

    def _static6_np(self, downscale):
        s = self._static6_cache.get(downscale)
        if s is not None:
            return s
        from mpsfm_tpu.integration.bini import build_static6
        from mpsfm_tpu.utils.interp import resize_bilinear

        depth, normals = self.depth, self.normals
        fx, fy, cx, cy = self._grid_K()
        if downscale > 1:
            hw = self._hw(downscale)
            vm = resize_bilinear(depth.valid.astype(np.float64), hw) > 0.5
            nm, nc = normals.data_downscaled, normals.uncertainty_downscaled
            fx, fy, cx, cy = fx / downscale, fy / downscale, cx / downscale, cy / downscale
        else:
            vm, nm, nc = depth.valid, normals.data, normals.uncertainty
        s = build_static6(
            vm, nm, nc, fx, fy, cx, cy,
            normals_magnitude_multiplier=self.conf.normals_magnitude_multiplier,
        )
        self._static6_cache[downscale] = s
        return s

    def _prior_dp_du(self, downscale):
        """(data_prior, uncertainty) at the downscaled grid, cached by
        (Depth.version, cumulative scale)."""
        key = (self.depth.version, float(self.depth.scale))
        c = self._prior_cache.get(downscale)
        if c is not None and c[0] == key:
            return c[1], c[2]
        from mpsfm_tpu.utils.interp import resize_bilinear

        if downscale > 1:
            hw = self._hw(downscale)
            dp = resize_bilinear(self.depth.data_prior, hw)
            du = resize_bilinear(self.depth.uncertainty, hw)
        else:
            dp, du = self.depth.data_prior, self.depth.uncertainty
        self._prior_cache[downscale] = (key, dp, du)
        return dp, du

    def static_prior_dev(self, downscale=1):
        """(dev8, prior_shift): device (8,H,W) slow transport rows
        [prec_prior, z_prior, c_x, c_y, nx, ny, prec_x, prec_y] plus the
        scalar log-scale drift since upload. Prior rescales in this
        pipeline are purely multiplicative (shift fixed at 0,
        bundle_adjustment.py:173), so the cache survives them: log-depth
        precision is scale-invariant and z_prior moves by log(s), applied
        in-program."""
        from mpsfm_tpu.integration.bini import build_prior2

        ver = self.depth.version
        s_now = float(self.depth.scale)
        ent = self._packed_dev.get(downscale)
        if ent is not None and ent["ver"] == ver:
            return ent["dev"], float(np.log(s_now / ent["s0"]))
        dp, du = self._prior_dp_du(downscale)
        prior2 = build_prior2(dp, du, self.conf.depth_magnitude_multiplier)
        dev = jnp.asarray(np.concatenate([prior2, self._static6_np(downscale)], 0))
        self._packed_dev[downscale] = {"ver": ver, "s0": s_now, "dev": dev, "zrow": None}
        return dev, 0.0

    def _anchor_payload(self, downscale=1):
        """Host (L,5) float32 anchor rows [y, x, val, logz, slot] after
        the prior scale filter (reference process_sparse_depth,
        integration.py:281-288) — the only per-call transport besides the
        cached device rows.

        Slot semantics (bini._assemble_from_anchors): when the BA point
        covariances live on device (LazyCovDict.device_view), val is the
        anchor depth and slot indexes the device cov array — the anchor
        precision d²/zvar is computed IN-PROGRAM, so the covariance
        dispatch is never read back to the host on this path. slot=-1
        falls back to the default cov (eye*1e-2); slot=-2 means val is a
        host-computed precision."""
        anchors = self._sparse_anchors()
        if anchors is None:
            return np.zeros((0, 5), np.float32)
        px, d3, pids = anchors
        px = px / downscale
        dp, _ = self._prior_dp_du(downscale)
        H, W = dp.shape
        xs = np.clip(np.round(px[:, 0]).astype(np.int64), 0, W - 1)
        ys = np.clip(np.round(px[:, 1]).astype(np.int64), 0, H - 1)
        d3 = np.asarray(d3, np.float64)
        keep = d3 > 0
        if self.conf.scale_filter:
            div = d3 / np.clip(dp[ys, xs], 1e-8, None)
            keep &= (div < self.conf.scale_filter_factor) & (
                div > 1 / self.conf.scale_filter_factor
            )
        xs, ys, d3, pids = xs[keep], ys[keep], d3[keep], np.asarray(pids)[keep]
        logz = np.log(np.clip(d3, 1e-8, None))
        covdict = self.rec.point_covs
        view = getattr(covdict, "device_view", lambda: None)()
        if view is not None:
            vals = np.asarray(d3, np.float64).copy()
            slots = covdict.slots_for(pids).astype(np.float64)
            R2 = self._R2()
            # rare fallback: pids absent from the device dispatch but
            # present as raw host covariances
            for i in np.where(slots < 0)[0]:
                raw = dict.get(covdict, int(pids[i]))  # built-in get: no flush
                if raw is not None:
                    zv = max(float(R2 @ raw @ R2), 1e-12)
                    vals[i] = d3[i] ** 2 / zv
                    slots[i] = -2.0
            return np.stack([ys, xs, vals, logz, slots], -1).astype(np.float32)
        zv = np.clip(self._point_zvars(pids), 1e-12, None)
        prec = (1.0 / zv) * d3**2
        slots = np.full(len(d3), -2.0)
        return np.stack([ys, xs, prec, logz, slots], -1).astype(np.float32)

    def _z0_shift_dev(self, downscale=1):
        """(z0_dev (H,W), shift): cached device working log-depth plus the
        scalar log-shift accumulated since its upload. Falls back to the
        z_prior row of the cached static rows when not activated."""
        from mpsfm_tpu.integration.bini import prior_z0
        from mpsfm_tpu.utils.interp import resize_bilinear

        depth = self.depth
        if depth.activated and (
            depth._data is not None or depth.data_log_dev() is not None
        ):
            key = ("d", depth.data_epoch)
            ent = self._z0_cache.get(downscale)
            if ent is not None and ent[0] == key:
                return ent[2], float(depth.data_log_shift - ent[1])
            handle = depth.data_log_dev()
            if handle is not None:
                # device-resident working map (fused refinement): derive
                # the (downscaled) z0 on device — no host round trip
                zdev, shift = handle
                if downscale > 1:
                    from mpsfm_tpu.integration.bini import resize_log_dev

                    dev = resize_log_dev(zdev, jnp.float32(shift), self._hw(downscale))
                else:
                    dev = zdev if shift == 0.0 else zdev + jnp.float32(shift)
                self._z0_cache[downscale] = (key, float(depth.data_log_shift), dev)
                return dev, 0.0
            if downscale > 1:
                z0 = np.log(np.clip(resize_bilinear(depth.data, self._hw(downscale)), 1e-8, None))
            else:
                z0 = np.log(np.clip(depth.data, 1e-8, None))
            dev = jnp.asarray(np.asarray(z0, np.float32))
            self._z0_cache[downscale] = (key, float(depth.data_log_shift), dev)
            return dev, 0.0
        # prior fallback: z0 = z_prior row of the cached static rows (at
        # its upload scale) + the same scalar drift
        dev8, prior_shift = self.static_prior_dev(downscale)
        ent = self._packed_dev[downscale]
        if ent["zrow"] is None:
            ent["zrow"] = prior_z0(dev8)
        return ent["zrow"], prior_shift

    def seed_z0(self, z_dev):
        """Seed the full-res z0 cache from a device solve output (called
        right after the batched integrator accepted depth.data)."""
        self._z0_cache[1] = (("d", self.depth.data_epoch), 0.0, z_dev)
        self._z0_cache.pop(self.conf.downscale_factor, None)

    def integrate(self, **kw):
        """Refine the working depth map. Returns True when changed
        (reference Image.integrate, integration.py:133-137)."""
        assert self.rec.images[self.imid].registered and self.depth.activated
        return integrate_bundle_batched([self])[self.imid]

    def calculate_int_covs_for_entire_image(
        self, downscaled=None, ignore_depths=False, estimator=None, stride=16
    ):
        """Per-pixel propagated depth VARIANCE map at the integration grid
        (reference calculate_int_covs_for_entire_image,
        integration.py:618-629): diag(H⁻¹) at every pixel × depth².
        ignore_depths drops the sparse-SfM anchor term from the Hessian
        (reference calculate_hessian sparse_depth=False, :522-560).

        estimator: 'exact' runs one indicator-CG solve per pixel (H·W
        solves — minutes per full-res image); 'subsampled' (default)
        solves the exact diagonal on a stride-subsampled pixel grid and
        bilinearly upsamples — diag(H⁻¹) is a smooth field in pixel
        space, so interpolation error is small while the work drops by
        stride² (~64-256x)."""
        from mpsfm_tpu.integration.bini import diag_inverse_at_batch_anchors
        from mpsfm_tpu.utils.interp import resize_bilinear

        estimator = estimator or self.conf.get("whole_image_estimator", "subsampled")
        use_ds = self.conf.downscaled if downscaled is None else bool(downscaled)
        ds = self.conf.downscale_factor if use_ds else 1
        pl = self._anchor_payload(downscale=ds)
        stat8, prior_shift = self.static_prior_dev(downscale=ds)
        z0, z0_shift = self._z0_shift_dev(downscale=ds)
        params = self.integrator.params._replace(cg_max_iter=int(self.conf.cov_cg_iters))
        if ignore_depths:
            params = params._replace(lambda2=0.0)
        h, w = stat8.shape[-2:]
        R2 = self._R2()
        anch = _pack_anchors(
            [(pl, z0_shift, prior_shift, R2)], (h, w), 1, _pow2(max(len(pl), 1), 64)
        )
        if estimator == "subsampled":
            ys = np.arange(0, h, stride, dtype=np.int32)
            xs = np.arange(0, w, stride, dtype=np.int32)
            if ys[-1] != h - 1:
                ys = np.append(ys, h - 1)
            if xs[-1] != w - 1:
                xs = np.append(xs, w - 1)
            gy, gx = np.meshgrid(ys, xs, indexing="ij")
            Kq = gy.size
            Kp = ((Kq + 127) // 128) * 128
            rowcol = np.zeros((1, 2, Kp), np.int32)
            rowcol[0, 0, :Kq] = gy.reshape(-1)
            rowcol[0, 1, :Kq] = gx.reshape(-1)
            sub = np.asarray(
                diag_inverse_at_batch_anchors(
                    jnp.asarray(anch), jnp.asarray(rowcol), params, 128,
                    _cov_dev_or_dummy(self.rec), (z0, stat8)
                )
            )[0, :Kq].reshape(len(ys), len(xs))
            # exact values on a non-uniform stride grid -> full grid via
            # separable linear interpolation at the true pixel positions
            from scipy.interpolate import RegularGridInterpolator

            interp = RegularGridInterpolator(
                (ys.astype(np.float64), xs.astype(np.float64)), sub, method="linear"
            )
            yy, xx = np.meshgrid(
                np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij"
            )
            varlog = interp(np.stack([yy.reshape(-1), xx.reshape(-1)], -1)).reshape(h, w)
        else:
            yy, xx = np.meshgrid(
                np.arange(h, dtype=np.int32), np.arange(w, dtype=np.int32), indexing="ij"
            )
            Kq = h * w
            # chunk-multiple (not power-of-two): whole-image queries are a
            # one-off viz shape per grid; pow2 padding would waste up to 2x
            Kp = ((Kq + 127) // 128) * 128
            rowcol = np.zeros((1, 2, Kp), np.int32)
            rowcol[0, 0, :Kq] = yy.reshape(-1)
            rowcol[0, 1, :Kq] = xx.reshape(-1)
            varlog = np.asarray(
                diag_inverse_at_batch_anchors(
                    jnp.asarray(anch), jnp.asarray(rowcol), params, 128,
                    _cov_dev_or_dummy(self.rec), (z0, stat8)
                )
            )[0, :Kq].reshape(h, w)
        if ds > 1:
            varlog = resize_bilinear(np.asarray(varlog, np.float64), self._hw(1))
        d = self.depth
        data = d.data if (d.activated and d.data is not None) else d.data_prior
        return varlog * np.asarray(data) ** 2

    def _int_cov_query(self, pts2d=None, z_override=None):
        """(packed, rows, cols, K, kps_sel, pts2d, params) for the diag(H⁻¹)
        queries at (a subset of) this image's keypoints on the downscaled
        integration grid."""
        rec = self.rec
        cam = rec.camera(self.imid)
        kps = rec.images[self.imid].keypoints
        if pts2d is None:
            pts2d = np.arange(len(kps))
        kps_sel = kps[pts2d]
        ds = self.conf.downscale_factor if self.conf.downscaled else 1
        pl = self._anchor_payload(downscale=ds)
        stat8, prior_shift = self.static_prior_dev(downscale=ds)
        if z_override is not None:
            # fused chain: the downscaled z0 derives from the FRESH
            # gate/solve output lane (device), not the pre-solve cache
            zfull, zshift = z_override
            if ds > 1:
                from mpsfm_tpu.integration.bini import resize_log_dev

                z0, z0_shift = resize_log_dev(zfull, jnp.float32(zshift), self._hw(ds)), 0.0
            else:
                z0, z0_shift = zfull, zshift
        else:
            z0, z0_shift = self._z0_shift_dev(downscale=ds)
        params = self.integrator.params._replace(cg_max_iter=int(self.conf.cov_cg_iters))
        h, w = stat8.shape[-2:]
        gx = np.clip(np.round(kps_sel[:, 0] * cam.sx / ds).astype(np.int32), 0, w - 1)
        gy = np.clip(np.round(kps_sel[:, 1] * cam.sy / ds).astype(np.int32), 0, h - 1)
        R2 = self._R2()
        return (
            (pl, z0_shift, prior_shift, R2, (z0, stat8)),
            gy, gx, len(gx), kps_sel, np.asarray(pts2d), params,
        )

    def _apply_int_covs(self, varlog, kps_sel, pts2d):
        d_prior = self.depth.data_prior_at_kps(kps_sel)
        var = varlog * d_prior**2  # var(log d) -> var(d)
        floor = float(self.conf.int_cov_rel_floor or 0.0)
        if floor > 0.0:
            var = np.maximum(var, (floor * d_prior) ** 2)
        for kp, v in zip(pts2d, var):
            self.depth.uncertainty_update[int(kp)] = float(max(v, 1e-12))
        self.int_covs_applied = True
        return var

    def calculate_int_covs_at_kps(self, pts2d=None):
        """Propagate diag(H⁻¹) to per-keypoint depth variances
        (reference calculate_int_covs_at_kps, integration.py:604-616)."""
        from mpsfm_tpu.integration.bini import diag_inverse_at_batch_anchors

        (pl, z0_shift, prior_shift, R2, pair), gy, gx, K, kps_sel, pts2d, params = (
            self._int_cov_query(pts2d)
        )
        # power-of-two buckets: distinct keypoint/anchor counts share one
        # compiled program (every fresh shape is a multi-second remote
        # compile on the tunneled backend)
        Kp = _pow2(K, 128)
        rowcol = np.zeros((1, 2, Kp), np.int32)
        rowcol[0, 0, :K], rowcol[0, 1, :K] = gy, gx
        shape = tuple(pair[1].shape[-2:])
        anch = _pack_anchors(
            [(pl, z0_shift, prior_shift, R2)], shape, 1, _pow2(max(len(pl), 1), 64)
        )
        varlog = np.asarray(
            diag_inverse_at_batch_anchors(
                jnp.asarray(anch), jnp.asarray(rowcol), params, 128,
                _cov_dev_or_dummy(self.rec), pair
            )
        )[0, :K]
        return self._apply_int_covs(varlog, kps_sel, pts2d)


def materialize_depths(rec, imids) -> None:
    """Materialize host copies of device-resident working depth maps for
    a set of images in ONE blocking read (the lazy Depth.data getter
    pays a ~40 ms tunnel read PER image; registration's 2D-3D lifting
    touches every reference image right after a refinement bumped their
    epochs). Matches the getter's math exactly: exp(z_f32 + shift) in
    f64."""
    from mpsfm_tpu.utils.transport import fetch_many

    todo = []
    for imid in imids:
        im = rec.images.get(imid)
        d = getattr(im, "depth", None) if im is not None else None
        if d is None:
            continue
        handle = d.data_log_dev() if d._data is None else None
        if handle is not None:
            todo.append((d, handle[0], handle[1]))
    if not todo:
        return
    vals = fetch_many([t[1] for t in todo])
    for (d, _z, shift), v in zip(todo, vals):
        d._data = np.exp(np.asarray(v, np.float64) + shift)


def _cov_dev_or_dummy(rec):
    """Device point-covariance array for the anchor path ((1,3,3) dummy
    when no dispatch exists — all anchor slots are then -1/-2)."""
    view = getattr(rec.point_covs, "device_view", lambda: None)()
    if view is None:
        return jnp.eye(3, dtype=jnp.float32)[None] * 1e-2
    return view[0]


def _pow2(n: int, base: int = 1) -> int:
    """Smallest base*2^k >= n."""
    b = base
    while b < n:
        b *= 2
    return b


def _pack_anchors(pl_shift, shape, B0, Ka):
    """(B0,6,Ka) float32 anchor transport rows [y, x, val, logz, slot,
    meta([5,0]=z0 shift, [5,1]=prior shift, [5,2:5]=R2)] from
    [(payload (L,5), z0_shift, prior_shift, R2), ...]; padded slots get
    out-of-range y so the device scatter drops them."""
    H = shape[0]
    anch = np.zeros((B0, 6, Ka), np.float32)
    anch[:, 0, :] = float(H)
    anch[:, 4, :] = -1.0
    for b, (pl, z0_shift, prior_shift, R2) in enumerate(pl_shift):
        L = len(pl)
        if L:
            anch[b, 0, :L] = pl[:, 0]
            anch[b, 1, :L] = pl[:, 1]
            anch[b, 2, :L] = pl[:, 2]
            anch[b, 3, :L] = pl[:, 3]
            anch[b, 4, :L] = pl[:, 4]
        anch[b, 5, 0] = z0_shift
        anch[b, 5, 1] = prior_shift
        anch[b, 5, 2:5] = np.asarray(R2, np.float32)
    n = len(pl_shift)
    if B0 > n:
        anch[n:] = anch[0]
    return anch


def integrate_bundle_deferred(pris):
    """Dispatch the whole-bundle depth refinement WITHOUT any blocking
    read: the should_refine energy gate and the gated IRLS solve run in
    ONE device program per grid-shape group
    (bini.bini_gate_solve_batch_anchors), with the host Integrator state
    shipped in as (B,2) scalars. Replaces the reference's per-image loop
    (mpsfm/sfm/mapper/base.py:619-631) and the round-4 two-call
    energy->host->solve structure (each call paid a ~35-100 ms tunnel
    read).

    Returns (handles, pending):
      handles: {imid: (z_out_dev (B,H,W), lane)} — each image's CURRENT
        log-depth at current scale on device (refined this call or the
        gated-through z0), for downstream device consumers (the BA
        depth-row sampler chains off these with no host transfer);
      pending: finalize_integration input (device arrays + entry lists).
    """
    from mpsfm_tpu.integration.bini import bini_gate_solve_batch_anchors
    from mpsfm_tpu.utils.profiling import TIMERS

    handles: dict = {}
    pending: list = []
    groups: dict = {}
    cov_dev = None
    if not pris:
        return handles, pending
    with TIMERS.phase("bini.build_inputs"), pris[0].rec.tri_angle_cache():
        rec0 = pris[0].rec
        if len(pris) > 1:
            # warm the angle cache with ONE bulk pass over the map: each
            # image's anchor filter then hits instead of issuing its own
            # observation sweep (the sweep is the fixed per-call cost)
            thr = pris[0].conf.robust_triangles
            if thr is not None:
                rec0.find_points3D_with_small_triangulation_angle(
                    thr, rec0.point_ids()
                )
        for pri in pris:
            if cov_dev is None:
                cov_dev = _cov_dev_or_dummy(pri.rec)
            with TIMERS.phase("bini.anchor_payload"):
                pl = pri._anchor_payload()
            with TIMERS.phase("bini.dev_rows"):
                stat8, prior_shift = pri.static_prior_dev()
                z0, z0_shift = pri._z0_shift_dev()
            R2 = pri._R2()
            key = (tuple(stat8.shape[-2:]), pri.integrator.params)
            groups.setdefault(key, []).append(
                (pri, pl, z0_shift, prior_shift, R2, (z0, stat8))
            )

    for (shape, params), entries in groups.items():
        n = len(entries)
        B0 = _pow2(n)
        Ka = _pow2(max(max((len(e[1]) for e in entries), default=1), 1), 64)
        with TIMERS.phase("bini.pack_anchors"):
            anch = _pack_anchors(
                [(pl, zs, ps, R2) for _, pl, zs, ps, R2, _ in entries], shape, B0, Ka
            )
        pairs = [e[5] for e in entries] + [entries[0][5]] * (B0 - n)
        prev = np.zeros((B0, 2), np.float32)
        for k, e in enumerate(entries):
            integ = e[0].integrator
            if integ.integrated and integ.energy_old is not None:
                prev[k] = (integ.energy_old, 1.0)
        prev[n:, 1] = 1.0
        prev[n:, 0] = np.inf  # padded lanes: never refine
        with TIMERS.phase("bini.gate_solve"):
            z_out, info4 = bini_gate_solve_batch_anchors(
                jnp.asarray(anch), jnp.asarray(prev), params, cov_dev, *pairs
            )
        for k, e in enumerate(entries):
            handles[e[0].imid] = (z_out, k)
        pending.append(([e[0] for e in entries], z_out, info4))
    return handles, pending


def finalize_integration(pending, fetched=None) -> dict:
    """Apply host-side Integrator bookkeeping from the fetched gate/solve
    results. Only the tiny (B,4) info rows cross the tunnel — the
    accepted log-depth grids STAY ON DEVICE (Depth.set_data_from_device;
    host copies materialize lazily on first access, e.g. the final
    depths.h5 write). fetched: [info (B,4) np] aligned with pending —
    pass results from a caller-batched fetch_many read; None fetches
    here (one read). Returns {imid: changed}."""
    from mpsfm_tpu.integration.bini import take_z
    from mpsfm_tpu.utils.transport import fetch_many

    if fetched is None:
        fetched = fetch_many([info_dev for _, _z, info_dev in pending])
    changed: dict = {}
    for (pris_g, z_dev, _info_dev), info in zip(pending, fetched):
        for k, pri in enumerate(pris_g):
            e0, e_eff, refine, aborted = (float(v) for v in info[k])
            if refine < 0.5:
                changed[pri.imid] = False
                continue
            integ = pri.integrator
            integ.energy_old = e_eff
            integ.integrated = True
            if aborted > 0.5:
                changed[pri.imid] = False
                continue
            z_lane = take_z(z_dev, jnp.int32(k))
            pri.depth.set_data_from_device(z_lane)
            pri.seed_z0(z_lane)
            changed[pri.imid] = True
    return changed


def integrate_bundle_batched(pris) -> dict:
    """Whole-bundle depth refinement with ONE blocking device read
    (gate + gated solve fused on device; see integrate_bundle_deferred).
    Returns {imid: changed}."""
    from mpsfm_tpu.utils.profiling import TIMERS

    _, pending = integrate_bundle_deferred(pris)
    with TIMERS.phase("bini.fetch_finalize"):
        return finalize_integration(pending)


def int_covs_bundle_batched(pris) -> None:
    """Whole-bundle uncertainty propagation in one device program per
    grid-shape group: packs every image's (downscaled) integration problem
    into a (B,11,h,w) array and runs diag(H⁻¹) indicator solves vmapped
    over the bundle (replaces the reference's per-image cholespy loop,
    integration.py:604-616 called from mapper/base.py). One (B,5,Ka)
    anchor upload + one (B,2,Kp) query upload; all dense rows are
    device-resident or scattered on device."""
    from mpsfm_tpu.integration.bini import diag_inverse_at_batch_anchors

    groups: dict = {}
    cov_dev = None
    for pri in pris:
        if cov_dev is None:
            cov_dev = _cov_dev_or_dummy(pri.rec)
        q = pri._int_cov_query()
        key = (tuple(q[0][4][1].shape[-2:]), q[6])
        groups.setdefault(key, []).append((pri, q))

    for (shape, params), entries in groups.items():
        # power-of-two buckets on batch dim, anchor width, and query
        # width: each distinct shape is a fresh multi-second remote compile
        Kmax = max(q[3] for _, q in entries)
        Kp = _pow2(Kmax, 128)
        n = len(entries)
        B = _pow2(n)
        rowcol = np.zeros((B, 2, Kp), np.int32)
        for b, (_, (_split, gy, gx, K, _, _, _)) in enumerate(entries):
            rowcol[b, 0, :K], rowcol[b, 1, :K] = gy, gx
        Ka = _pow2(max(max((len(q[0][0]) for _, q in entries), default=1), 1), 64)
        anch = _pack_anchors([q[0][:4] for _, q in entries], shape, B, Ka)
        pairs = [q[0][4] for _, q in entries] + [entries[0][1][0][4]] * (B - n)
        varlog = np.asarray(
            diag_inverse_at_batch_anchors(
                jnp.asarray(anch), jnp.asarray(rowcol), params, 128, cov_dev, *pairs
            )
        )
        for b, (pri, (_, _, _, K, kps_sel, pts2d, _)) in enumerate(entries):
            pri._apply_int_covs(varlog[b, :K], kps_sel, pts2d)


@jax.jit
def _changed_flag_dev(info4, lane):
    """Device scalar: did this image's integration change (refine and
    not aborted) — from the gate/solve info rows."""
    info = jax.lax.dynamic_index_in_dim(info4, lane, 0, keepdims=False)
    return ((info[2] > 0.5) & (info[3] < 0.5)).astype(jnp.float32)


@jax.jit
def _updated_unc_dev(varlog_batch, lane, old_unc, dprior, info4, info_lane, floor):
    """Device mirror of _apply_int_covs for the fused chain: the updated
    per-keypoint depth variances (padded to the varlog bucket) where the
    integration CHANGED this image (info4 [e0,e,refine,aborted] lane),
    the previous values otherwise."""
    varlog = jax.lax.dynamic_index_in_dim(varlog_batch, lane, 0, keepdims=False)
    info = jax.lax.dynamic_index_in_dim(info4, info_lane, 0, keepdims=False)
    changed = (info[2] > 0.5) & (info[3] < 0.5)
    new = jnp.maximum(varlog * dprior * dprior, (floor * dprior) ** 2)
    new = jnp.maximum(new, 1e-12)
    return jnp.where(changed, new, old_unc)


def int_covs_bundle_deferred(pris, handles, info_map):
    """Dispatch the whole-bundle diag(H⁻¹) propagation chained off the
    FRESH gate/solve output (no blocking read): the downscaled z0 for
    each image's Hessian resizes from its integrate_bundle_deferred
    handle on device, and the updated per-keypoint variances are
    produced as device rows gated per-lane by the changed flag — the BA
    depth-row builder consumes them directly (ba/device_depth.py), and
    the host bookkeeping (_apply_int_covs) runs later from the same
    packed read that returns the BA result.

    Returns (unc_by_imid {imid: (padded Kp,) device updated
    uncertainty_update indexed by keypoint id}, pending_covs
    [(pri, varlog_dev, lane, K, kps_sel, pts2d, info_dev, info_lane)]).
    """
    from mpsfm_tpu.integration.bini import (
        diag_inverse_gated_batch_anchors,
        take_z,
    )

    groups: dict = {}
    cov_dev = None
    with pris[0].rec.tri_angle_cache():
        for pri in pris:
            if cov_dev is None:
                cov_dev = _cov_dev_or_dummy(pri.rec)
            z_b, lane = handles[pri.imid]
            q = pri._int_cov_query(z_override=(take_z(z_b, jnp.int32(lane)), 0.0))
            key = (tuple(q[0][4][1].shape[-2:]), q[6])
            groups.setdefault(key, []).append((pri, q))

    unc_by_imid: dict = {}
    pending_covs: list = []
    for (shape, params), entries in groups.items():
        Kmax = max(q[3] for _, q in entries)
        Kp = _pow2(Kmax, 128)
        n = len(entries)
        B = _pow2(n)
        rowcol = np.zeros((B, 2, Kp), np.int32)
        for b, (_, (_split, gy, gx, K, _, _, _)) in enumerate(entries):
            rowcol[b, 0, :K], rowcol[b, 1, :K] = gy, gx
        Ka = _pow2(max(max((len(q[0][0]) for _, q in entries), default=1), 1), 64)
        anch = _pack_anchors([q[0][:4] for _, q in entries], shape, B, Ka)
        pairs = [q[0][4] for _, q in entries] + [entries[0][1][0][4]] * (B - n)
        flags = jnp.stack(
            [
                _changed_flag_dev(info_map[pri.imid][0], jnp.int32(info_map[pri.imid][1]))
                for pri, _ in entries
            ]
            + [jnp.zeros((), jnp.float32)] * (B - n)
        )
        varlog_dev = diag_inverse_gated_batch_anchors(
            jnp.asarray(anch), jnp.asarray(rowcol), params, 128, cov_dev, flags, *pairs
        )
        for b, (pri, (_, _, _, K, kps_sel, pts2d, _)) in enumerate(entries):
            info_dev, info_lane = info_map[pri.imid]
            old = np.ones(Kp, np.float32)
            old[:K] = np.asarray(pri.depth.uncertainty_update)[pts2d]
            dprior = np.ones(Kp, np.float32)
            dprior[:K] = pri.depth.data_prior_at_kps(kps_sel)
            floor = float(pri.conf.int_cov_rel_floor or 0.0)
            unc_by_imid[pri.imid] = _updated_unc_dev(
                varlog_dev, jnp.int32(b), jnp.asarray(old), jnp.asarray(dprior),
                info_dev, jnp.int32(info_lane), jnp.float32(floor),
            )
            pending_covs.append(
                (pri, varlog_dev, b, K, kps_sel, pts2d, info_dev, info_lane)
            )
    return unc_by_imid, pending_covs


def finalize_deferred_all(pending, pending_covs):
    """Finalize a deferred integrate (+ chained int_covs) outside the
    fused BA read — the bail-out path (DC failure, dense-solver
    fallback). Returns the changed map."""
    from mpsfm_tpu.utils.transport import fetch_many

    changed_map = finalize_integration(pending) if pending else {}
    if pending_covs:
        uniq = {}
        for entry in pending_covs:
            uniq[id(entry[1])] = entry[1]
        fetched = dict(zip(uniq.keys(), fetch_many(list(uniq.values()))))
        finalize_int_covs(
            pending_covs, [fetched[id(e[1])] for e in pending_covs], changed_map
        )
    return changed_map


def finalize_int_covs(pending_covs, fetched_varlogs, changed_map):
    """Host bookkeeping for the deferred int_covs chain: apply the
    fetched diag(H⁻¹) rows to uncertainty_update for images whose
    integration changed (mirrors the batched path's need_covs gate)."""
    for (pri, _vd, b, K, kps_sel, pts2d, _i, _l), varlog in zip(
        pending_covs, fetched_varlogs
    ):
        if changed_map.get(pri.imid):
            pri._apply_int_covs(np.asarray(varlog[b, :K], np.float64), kps_sel, pts2d)
