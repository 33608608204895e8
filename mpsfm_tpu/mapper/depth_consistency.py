"""Two-view depth-consistency verification (z-buffered cross-projection).

TPU-native port of the reference's DepthConsistencyChecker
(mpsfm/sfm/mapper/depthconsistency.py): each image's refined depth map is
splatted into the other view with min-depth z-buffering, differences are
whitened by lifted + rotated covariances, pixels classified
surface/occluded/invalid, and the pair score is the max invalid/valid
ratio over both directions. The scatter-min z-buffer and the whitening
are one jitted device program per direction; the relaxation ladder
(×1.3 threshold growth, skip after 4) lives on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.config import BaseClass
from mpsfm_tpu.scene.reconstruction import Reconstruction


@partial(jax.jit, static_argnames=("out_hw",))
def reproject_depth_jax(depth1, K1, K2, M12, out_hw):
    """Project depth map 1 into view 2. Returns (p2D12 (H,W,2), depth12,
    in-canvas mask). M12 = cam2_from_world @ world_from_cam1 as 3x4."""
    H, W = depth1.shape
    x = jnp.arange(W, dtype=depth1.dtype)
    y = jnp.arange(H, dtype=depth1.dtype)
    xx, yy = jnp.meshgrid(x, y)
    d = jnp.where(depth1 <= 0, 0.1, depth1)
    xn = (xx - K1[0, 2]) / K1[0, 0]
    yn = (yy - K1[1, 2]) / K1[1, 1]
    p_c1 = jnp.stack([xn * d, yn * d, d], -1)  # (H,W,3)
    p_c2 = jnp.einsum("ij,hwj->hwi", M12[:, :3], p_c1) + M12[:, 3]
    z2 = p_c2[..., 2]
    zs = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    u2 = p_c2[..., 0] / zs * K2[0, 0] + K2[0, 2]
    v2 = p_c2[..., 1] / zs * K2[1, 1] + K2[1, 2]
    H2, W2 = out_hw
    mask = (u2 >= 0) & ((u2 + 0.5) < W2) & (v2 >= 0) & ((v2 + 0.5) < H2) & (z2 > 0)
    return jnp.stack([u2, v2], -1), z2, mask


@partial(jax.jit, static_argnames=("out_hw",))
def min_buffer_jax(p2D, depth_proj, mask, out_hw):
    """Scatter-min z-buffer: returns (min depth buffer (out_hw), per-source
    'won the buffer' mask). Reference find_min_buffer
    (depthconsistency.py:51-60) via a scatter-min instead of a loop."""
    H2, W2 = out_hw
    u = jnp.clip(p2D[..., 0].astype(jnp.int32), 0, W2 - 1)
    v = jnp.clip(p2D[..., 1].astype(jnp.int32), 0, H2 - 1)
    flat = v * W2 + u
    d = jnp.where(mask, depth_proj, jnp.inf)
    buf = jnp.full((H2 * W2,), jnp.inf, depth_proj.dtype).at[flat.reshape(-1)].min(d.reshape(-1))
    won = (d == buf[flat]) & mask
    return buf.reshape(H2, W2), won


def _seg_copy_forward(flags, vals):
    """Segmented copy-forward: each position gets the value at the start of
    its segment (flags mark segment starts). Associative, scatter-free."""

    def comb(a, b):
        af, av = a
        bf, bv = b
        return (af | bf, jnp.where(bf, bv, av))

    return jax.lax.associative_scan(comb, (flags, vals))[1]


def _min_at_src(p2D, depth_proj, mask, out_hw):
    """Gather-only z-buffer: for every source pixel, the min projected depth
    among all source pixels landing on the same destination pixel, plus the
    'won the buffer' mask. Sort-based segment-min — no scatters, so it maps
    onto TPU sort units instead of serialized scatter updates (the
    `.at[].min` hazard for large grids)."""
    H2, W2 = out_hw
    u = jnp.clip(p2D[..., 0].astype(jnp.int32), 0, W2 - 1)
    v = jnp.clip(p2D[..., 1].astype(jnp.int32), 0, H2 - 1)
    flat = jnp.where(mask, v * W2 + u, H2 * W2).reshape(-1)
    d = jnp.where(mask, depth_proj, jnp.inf).reshape(-1)
    idx = jnp.arange(d.shape[0], dtype=jnp.int32)
    flat_s, d_s, idx_s = jax.lax.sort((flat, d, idx), num_keys=2)
    starts = jnp.concatenate(
        [jnp.ones((1,), bool), flat_s[1:] != flat_s[:-1]]
    )
    segmin_s = _seg_copy_forward(starts, d_s)
    # unsort by a second (gather-only) sort on the original index
    _, segmin = jax.lax.sort((idx_s, segmin_s), num_keys=1)
    segmin = segmin.reshape(depth_proj.shape)
    won = (jnp.where(mask, depth_proj, jnp.inf) == segmin) & mask
    return segmin, won


def _dir_counts(d_s, var_s, K_s, d_d, var_d, K_d, M_sd, r2, c, thresh):
    """One direction of the whitened consistency test, reduced to the two
    integer counts the bundle score needs: (#not-valid, #not-occluded) over
    in-canvas source pixels. Fused on-device version of the reference's
    reproject → z-buffer → whiten → classify chain
    (depthconsistency.py:62-159 + points3D_utils.py:31-60)."""
    H, W = d_s.shape
    p, z, m = _reproject_core(d_s, K_s, K_d, M_sd, d_d.shape)
    segmin, won = _min_at_src(p, z, m, d_d.shape)
    x = jnp.arange(W, dtype=d_s.dtype)
    y = jnp.arange(H, dtype=d_s.dtype)
    xx, yy = jnp.meshgrid(x, y)
    fx, fy, cx, cy = K_s[0, 0], K_s[1, 1], K_s[0, 2], K_s[1, 2]
    sigma_q = jnp.asarray(1.0, d_s.dtype)  # px (reference default)
    dpdd = r2[0] * (xx - cx) / fx + r2[1] * (yy - cy) / fy + r2[2]
    zbar_var = var_s * dpdd**2 + sigma_q**2 * (
        (r2[0] * d_s / fx) ** 2 + (r2[1] * d_s / fy) ** 2
    )
    H2, W2 = d_d.shape
    u = jnp.clip(p[..., 0].astype(jnp.int32), 0, W2 - 1)
    v = jnp.clip(p[..., 1].astype(jnp.int32), 0, H2 - 1)
    dflat = (v * W2 + u).reshape(-1)
    dd_at = jnp.take(d_d.reshape(-1), dflat).reshape(H, W)
    var_d_at = jnp.take(var_d.reshape(-1), dflat).reshape(H, W)
    t = (segmin - dd_at) / jnp.sqrt(c * c * (zbar_var + var_d_at) + 1e-12)
    t = jnp.where(won, t, 0.0)
    surface = (jnp.abs(t) < thresh) & m
    occl = (t > thresh) & m
    valid = surface | occl
    nv = (m & ~valid).sum(dtype=jnp.int32)
    nocc = (m & ~occl).sum(dtype=jnp.int32)
    return nv, nocc


def _reproject_core(depth1, K1, K2, M12, out_hw):
    """Un-jitted body of reproject_depth_jax (usable inside vmap)."""
    H, W = depth1.shape
    x = jnp.arange(W, dtype=depth1.dtype)
    y = jnp.arange(H, dtype=depth1.dtype)
    xx, yy = jnp.meshgrid(x, y)
    d = jnp.where(depth1 <= 0, 0.1, depth1)
    xn = (xx - K1[0, 2]) / K1[0, 0]
    yn = (yy - K1[1, 2]) / K1[1, 1]
    p_c1 = jnp.stack([xn * d, yn * d, d], -1)
    p_c2 = jnp.einsum("ij,hwj->hwi", M12[:, :3], p_c1) + M12[:, 3]
    z2 = p_c2[..., 2]
    zs = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    u2 = p_c2[..., 0] / zs * K2[0, 0] + K2[0, 2]
    v2 = p_c2[..., 1] / zs * K2[1, 1] + K2[1, 2]
    H2, W2 = out_hw
    mask = (u2 >= 0) & ((u2 + 0.5) < W2) & (v2 >= 0) & ((v2 + 0.5) < H2) & (z2 > 0)
    return jnp.stack([u2, v2], -1), z2, mask


def _pair_counts(d_q, var_q, Kq, fac_q, d_r, var_r, Kr, row, c, thresh):
    """(qry_nv, qry_v, ref_nv, ref_v) for one (query, ref) pair.

    The depth/variance grids arrive as device-cached bases times scalar
    factors (fac_q (2,), row[0:2]) so pure rescales never re-upload
    them; row (32,) packs [fac_r(2), M_qr(12), M_rq(12), r2_qr(3),
    r2_rq(3)] — the only per-pair upload."""
    d_q = d_q * fac_q[0]
    var_q = var_q * fac_q[1]
    d_r = d_r * row[0]
    var_r = var_r * row[1]
    M_qr = row[2:14].reshape(3, 4)
    M_rq = row[14:26].reshape(3, 4)
    r2_qr = row[26:29]
    r2_rq = row[29:32]
    nv_q, v_q = _dir_counts(d_q, var_q, Kq, d_r, var_r, Kr, M_qr, r2_qr, c, thresh)
    nv_r, v_r = _dir_counts(d_r, var_r, Kr, d_q, var_q, Kq, M_rq, r2_rq, c, thresh)
    return jnp.stack([nv_q, v_q, nv_r, v_r])


_bundle_counts = jax.jit(
    jax.vmap(
        _pair_counts,
        in_axes=(None, None, None, None, 0, 0, 0, 0, None, None),
    )
)


class DepthConsistencyChecker(BaseClass):
    default_conf = {
        "depth_cons_valid_thresh": 0.6,
        "depth_cons_thresh": 0.15,
        "init_depth_cons_thresh": 0.09,
        "init_valid_thresh": 0.8,
        "depth_consistency_resample": False,
        "c": 15.0,
        "verbose": 0,
    }

    def _init(self, rec: Reconstruction):
        self.rec = rec
        self.depth_cons_thresh = self.conf.depth_cons_thresh
        self.reg_batch_dc_times_failed = 0
        self.cons_thresh_times_increased = 0
        self.skip_dc_check = False
        # per-image device caches of (depth, variance, K) grids; pure
        # multiplicative rescales only change the scalar factors
        self._dev_cache: dict = {}

    # --- ladder state (reference :27-49) ---
    def at_registration_success(self):
        self.cons_thresh_times_increased = 0
        self.depth_cons_thresh = self.conf.depth_cons_thresh
        self.reg_batch_dc_times_failed = 0
        for im in self.rec.images.values():
            im.ignore_matches_AP = {}
            im.failed_dc_check = False
        self.skip_dc_check = False

    def relax_thresholds(self):
        self.depth_cons_thresh *= 1.3
        self.cons_thresh_times_increased += 1
        self.reg_batch_dc_times_failed = 0
        for im in self.rec.images.values():
            im.ignore_matches_AP = {}
            im.failed_dc_check = False

    # --- core check ---
    def _image_depth(self, imid):
        d = self.rec.images[imid].depth
        return d.data if (d.activated and d.data is not None) else d.data_prior

    def _K_grid(self, imid):
        cam = self.rec.camera(imid)
        K = cam.calibration_matrix().copy()
        K[0] *= cam.sx
        K[1] *= cam.sy
        return K

    def check_depth_consistency(self, imid1, imid2, score_thresh=None):
        """Returns the per-direction classification dict (reference :62-159)."""
        rec = self.rec
        if score_thresh is None:
            score_thresh = self.conf.depth_cons_valid_thresh
        c = self.conf.c

        d1 = np.asarray(self._image_depth(imid1), np.float32)
        d2 = np.asarray(self._image_depth(imid2), np.float32)
        K1 = jnp.asarray(self._K_grid(imid1), jnp.float32)
        K2 = jnp.asarray(self._K_grid(imid2), jnp.float32)
        pose1 = rec.images[imid1].pose
        pose2 = rec.images[imid2].pose
        M12 = pose2.matrix() @ np.vstack([pose1.inverse().matrix(), [0, 0, 0, 1]])
        M21 = pose1.matrix() @ np.vstack([pose2.inverse().matrix(), [0, 0, 0, 1]])

        p12, z12, m12 = reproject_depth_jax(jnp.asarray(d1), K1, K2, jnp.asarray(M12, jnp.float32), d2.shape)
        p21, z21, m21 = reproject_depth_jax(jnp.asarray(d2), K2, K1, jnp.asarray(M21, jnp.float32), d1.shape)
        buf12, won12 = min_buffer_jax(p12, z12, m12, d2.shape)
        buf21, won21 = min_buffer_jax(p21, z21, m21, d1.shape)

        p12 = np.asarray(p12)
        p21 = np.asarray(p21)
        m12 = np.asarray(m12)
        m21 = np.asarray(m21)
        buf12 = np.asarray(buf12)
        buf21 = np.asarray(buf21)
        won12 = np.asarray(won12)
        won21 = np.asarray(won21)

        # whitened test statistic t = (buffer - target depth)/sqrt(c²(σ̄²+σ²))
        def whiten(src_id, dst_id, won_src, d_src, p_src, buf_src, d_dst):
            var_s = np.asarray(rec.images[src_id].depth.uncertainty, np.float64).copy()
            var_s /= rec.images[src_id].depth.conf.prior_std_multiplier**2
            var_d = np.asarray(rec.images[dst_id].depth.uncertainty, np.float64).copy()
            var_d /= rec.images[dst_id].depth.conf.prior_std_multiplier**2
            ys, xs = np.where(won_src)
            # Exact z-variance of the lifted source pixel in the dst frame
            # (reference lifted_pointcovs_cam + rotate chain,
            # points3D_utils.py:31-60): with lifted cov
            #   Σ = var_d·(∂p/∂d)(∂p/∂d)ᵀ + σ_q²·(∂p/∂q)(∂p/∂q)ᵀ,
            # the rotated z-variance is r₂ᵀ Σ r₂ with r₂ the third row of
            # R_dst R_srcᵀ — closed form below.
            R12 = (
                rec.images[dst_id].pose.rotation_matrix()
                @ rec.images[src_id].pose.rotation_matrix().T
            )
            r2 = R12[2]
            cam = rec.camera(src_id)
            fx = cam.fx * cam.sx
            fy = cam.fy * cam.sy
            cx = cam.cx * cam.sx
            cy = cam.cy * cam.sy
            dd = d_src[ys, xs]
            sigma_q = 1.0  # px (reference default)
            dpdd = r2[0] * (xs - cx) / fx + r2[1] * (ys - cy) / fy + r2[2]
            zbar_var = var_s[ys, xs] * dpdd**2 + sigma_q**2 * (
                (r2[0] * dd / fx) ** 2 + (r2[1] * dd / fy) ** 2
            )
            u = np.clip(p_src[ys, xs, 0].astype(int), 0, d_dst.shape[1] - 1)
            v = np.clip(p_src[ys, xs, 1].astype(int), 0, d_dst.shape[0] - 1)
            t = buf_src[v, u] - d_dst[v, u]
            t = t / np.sqrt((np.sqrt(zbar_var) * c) ** 2 + (np.sqrt(var_d[v, u]) * c) ** 2 + 1e-12)
            full_t = np.zeros(won_src.shape)
            full_t[ys, xs] = t
            return full_t

        t1 = whiten(imid1, imid2, won12, d1, p12, buf12, d2)
        t2 = whiten(imid2, imid1, won21, d2, p21, buf21, d1)

        def classify(t, canv):
            surface = (np.abs(t) < score_thresh) & canv
            occl = (t > score_thresh) & canv
            invalid = (t < -score_thresh) & canv
            return surface, occl, invalid

        s1, o1, i1 = classify(t1, m12)
        s2, o2, i2 = classify(t2, m21)
        return {
            "valid1": s1 | o1,
            "valid2": s2 | o2,
            "occl1": o1,
            "occl2": o2,
            "invalid1": i1,
            "invalid2": i2,
            "valid1_mask": m12,
            "valid2_mask": m21,
        }

    def _dc_arrays(self, imid):
        """(depth f32, variance f32 (÷psm²), K f32) grids for one image."""
        d = self.rec.images[imid].depth
        var = np.asarray(d.uncertainty, np.float32) / np.float32(
            d.conf.prior_std_multiplier**2
        )
        return (
            np.asarray(self._image_depth(imid), np.float32),
            var,
            np.asarray(self._K_grid(imid), np.float32),
        )

    def _dc_dev(self, imid, z_overrides=None):
        """((d_dev, d_fac), (var_dev, var_fac), K_dev): device-cached
        grids + the scalar factors accumulated since their upload (pure
        rescales are multiplicative in both depth and variance).
        z_overrides {imid: (log-depth dev, shift)} supplies a NOT-yet-
        finalized integration output (the fused post-registration chain
        checks consistency before the z ever reaches the host)."""
        d = self.rec.images[imid].depth
        c = self._dev_cache.setdefault(imid, {})
        s = float(d.scale)
        if z_overrides and imid in z_overrides:
            from mpsfm_tpu.integration.bini import exp_shift_dev

            zdev2, zsh = z_overrides[imid]
            vent = self._dc_var_ent(imid, c, d, s)
            K = self._dc_K(imid, c)
            return (
                (exp_shift_dev(zdev2, jnp.float32(zsh)), 1.0),
                (vent[2], (s / vent[1]) ** 2),
                K,
            )
        if d.activated and (
            d._data is not None or d.data_log_dev() is not None
        ):
            dkey = ("d", d.data_epoch)
            ent = c.get("d")
            if ent is None or ent[0] != dkey:
                handle = d.data_log_dev()
                if handle is not None:
                    # device-resident working map: exp on device, no
                    # host materialization or re-upload
                    from mpsfm_tpu.integration.bini import exp_shift_dev

                    zdev, shift = handle
                    ent = (
                        dkey,
                        float(d.data_log_shift),
                        exp_shift_dev(zdev, jnp.float32(shift)),
                    )
                else:
                    ent = (dkey, float(d.data_log_shift), jnp.asarray(np.asarray(d.data, np.float32)))
                c["d"] = ent
            d_fac = float(np.exp(d.data_log_shift - ent[1]))
        else:
            dkey = ("p", d.version)
            ent = c.get("d")
            if ent is None or ent[0] != dkey:
                ent = (dkey, s, jnp.asarray(np.asarray(d.data_prior, np.float32)))
                c["d"] = ent
            d_fac = s / ent[1]
        vent = self._dc_var_ent(imid, c, d, s)
        v_fac = (s / vent[1]) ** 2
        K = self._dc_K(imid, c)
        return (ent[2], d_fac), (vent[2], v_fac), K

    def _dc_var_ent(self, imid, c, d, s):
        vkey = ("v", d.version)
        vent = c.get("v")
        if vent is None or vent[0] != vkey:
            var = np.asarray(d.uncertainty, np.float32) / np.float32(
                d.conf.prior_std_multiplier**2
            )
            vent = (vkey, s, jnp.asarray(var))
            c["v"] = vent
        return vent

    def _dc_K(self, imid, c):
        K = c.get("K")
        if K is None:
            K = jnp.asarray(np.asarray(self._K_grid(imid), np.float32))
            c["K"] = K
        return K

    def check_bundle_depth_consistency(self, imid, bundle, score_thresh=None,
                                       z_overrides=None):
        """Bundle score = max over {query, refs} of invalid/valid pixel ratio
        (reference :213-246). All (query, ref) pairs with a common grid shape
        run in ONE batched device program (reproject + sort-based z-buffer +
        whiten + classify + count, vmapped over refs) — replacing per-pair
        device calls + host whitening."""
        optim_ids = [i for i in bundle["optim_ids"] if i != imid]
        if score_thresh is None:
            score_thresh = self.conf.depth_cons_valid_thresh
        rec = self.rec
        (d_q, dq_fac), (var_q, vq_fac), K_q = self._dc_dev(imid, z_overrides)
        pose_q = rec.images[imid].pose
        Rq = pose_q.rotation_matrix()
        Mq44 = np.vstack([pose_q.inverse().matrix(), [0, 0, 0, 1]])

        groups: dict[tuple, list] = {}
        for ref in optim_ids:
            (d_r, dr_fac), (var_r, vr_fac), K_r = self._dc_dev(ref, z_overrides)
            pose_r = rec.images[ref].pose
            M_qr = pose_r.matrix() @ Mq44
            M_rq = pose_q.matrix() @ np.vstack([pose_r.inverse().matrix(), [0, 0, 0, 1]])
            R_rq = pose_r.rotation_matrix() @ Rq.T  # R_ref R_queryᵀ
            row = np.concatenate(
                [[dr_fac, vr_fac], M_qr.reshape(-1), M_rq.reshape(-1), R_rq[2], R_rq[:, 2]]
            ).astype(np.float32)
            groups.setdefault(tuple(d_r.shape), []).append((d_r, var_r, K_r, row))

        ref_nv, ref_v, qry_nv, qry_v = 0, 0, 0, 0
        for items in groups.values():
            # device-side stacks of cached grids; one (B,32) host upload
            counts = np.asarray(
                _bundle_counts(
                    d_q,
                    var_q,
                    K_q,
                    jnp.asarray(np.array([dq_fac, vq_fac], np.float32)),
                    jnp.stack([it[0] for it in items]),
                    jnp.stack([it[1] for it in items]),
                    jnp.stack([it[2] for it in items]),
                    jnp.asarray(np.stack([it[3] for it in items])),
                    jnp.float32(self.conf.c),
                    jnp.float32(score_thresh),
                )
            )
            qry_nv += int(counts[:, 0].sum())
            qry_v += int(counts[:, 1].sum())
            ref_nv += int(counts[:, 2].sum())
            ref_v += int(counts[:, 3].sum())
        score = max(ref_nv / max(ref_v, 0.1), qry_nv / max(qry_v, 0.1))
        return score

    def check_image(self, imid, bundle, z_overrides=None):
        score = self.check_bundle_depth_consistency(imid, bundle, z_overrides=z_overrides)
        self.rec.images[imid].last_dc_score = score
        if score > self.depth_cons_thresh:
            self.log(f"Depth consistency failed for {imid}: {score:.3f}")
            self.at_failure(imid)
            return False
        self.log(f"Depth consistency passed for {imid}: {score:.3f}", level=2)
        return True

    def check_init_pair(self, init_pair):
        ref = list(init_pair)[0]
        score = self.check_bundle_depth_consistency(
            ref, {"optim_ids": set(init_pair)}, score_thresh=self.conf.init_valid_thresh
        )
        return score <= self.conf.init_depth_cons_thresh

    def pre_fail(self, imid):
        """Fail a candidate before registration from its previous DC score
        (reference depthconsistency.py:169-192 — the upstream body is
        unfinished/raises; this implements its documented skip logic)."""
        im = self.rec.images[imid]
        if im.last_dc_score is None:
            return False
        if self.conf.depth_consistency_resample and im.dc_times_inliers_resampled == 0:
            return False  # resampling not yet tried: give it a chance
        if self.skip_dc_check:
            return False
        if im.last_dc_score > self.depth_cons_thresh:
            self.log(f"Depth consistency pre-failed for {imid}: {im.last_dc_score:.3f}", level=1)
            self.reg_batch_dc_times_failed += 1
            return True
        return False

    def at_failure(self, imid):
        im = self.rec.images[imid]
        im.failed_dc_check = True
        if self.conf.depth_consistency_resample:
            im.dc_times_inliers_resampled += 1
            for ref_id, inlier_mask in self.rec.last_ap_inlier_masks.items():
                if len(inlier_mask) > 0:
                    if ref_id in im.ignore_matches_AP:
                        used = ~im.ignore_matches_AP[ref_id]
                        im.ignore_matches_AP[ref_id][used] |= inlier_mask
                    else:
                        im.ignore_matches_AP[ref_id] = inlier_mask.copy()
        self.reg_batch_dc_times_failed += 1
