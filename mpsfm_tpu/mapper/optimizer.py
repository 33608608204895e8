"""Optimizer facade: the reference Optimizer's public API
(mpsfm/sfm/mapper/bundle_adjustment.py:18-333) over the TPU LM core."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.ba import losses
from mpsfm_tpu.ba.covariance import calculate_point_covs as _calc_covs
from mpsfm_tpu.ba.problem import apply_ba_result, build_ba_data
from mpsfm_tpu.ba.shift_scale import optimize_prior_shiftscale as _shift_scale
from mpsfm_tpu.ba.shift_scale import update_truncation_multiplier as _trunc
from mpsfm_tpu.ba.solver import solve_ba
from mpsfm_tpu.config import BaseClass
from mpsfm_tpu.scene.reconstruction import Reconstruction


@partial(jax.jit)
def _pack_result(quat, t, xyz, cost0, cost, accepted):
    """Pack the solver outputs into one flat f32 row so the host reads
    them in a SINGLE transfer (per-read tunnel latency dominates)."""
    return jnp.concatenate([
        quat.astype(jnp.float32).ravel(),
        t.astype(jnp.float32).ravel(),
        xyz.astype(jnp.float32).ravel(),
        jnp.stack([cost0, cost, accepted.astype(jnp.float32)]),
    ])


def _fetch_result(quat, t, xyz, cost0, cost, accepted):
    C = quat.shape[0]
    P = xyz.shape[0]
    flat = np.asarray(_pack_result(quat, t, xyz, cost0, cost, accepted))
    q = flat[: 4 * C].reshape(C, 4)
    tt = flat[4 * C: 7 * C].reshape(C, 3)
    x = flat[7 * C: 7 * C + 3 * P].reshape(P, 3)
    return q, tt, x, flat[7 * C + 3 * P:]


class Optimizer(BaseClass):
    default_conf = {
        "depth_loss_name": "cauchy",
        "ref3d_loss_name": "trivial",
        "reproj_loss_name": "softl1",
        "reproj_loss_scale": 1.5,
        "scale_filter": True,
        "scale_filter_factor": 1.5,
        "metric_scale_filter": True,
        "rob_std": 2,
        "min_truncation_mult": None,
        "single_rescale": True,
        "max_iters": 20,
        "cg_iters": 32,
        "use_depth": True,
        # distributed BA (VERDICT r2 item 3): global refinements above
        # dist_ba_min_cams cameras partition point blocks over the device
        # mesh and solve with explicit shard_map/psum collectives
        # (parallel/dist_ba.py); single-device below the threshold or when
        # only one device exists. "auto" | "on" | "off".
        "dist_ba": "auto",
        "dist_ba_min_cams": 96,
        "dist_ba_shards": 0,  # 0 -> all local devices
        "verbose": 0,
    }

    def _init(self, rec: Reconstruction):
        self.rec = rec
        self.truncation_multiplier = 1.0
        self.dist_solves = 0  # observability: how many BAs ran on the mesh

    def _solve(self, bundle, mode, fix_pose, depth_loss_name, param_multiplier=1.0,
               allow_scale_filter=False, depth_type="update"):
        from mpsfm_tpu.utils.profiling import TIMERS

        n_shards = self._use_dist_ba(bundle, mode) if not fix_pose else 0
        with TIMERS.phase("ba.build_data"):
            prob = self._build(
                bundle, mode, fix_pose, param_multiplier,
                allow_scale_filter, depth_type,
                # the distributed solver partitions the sparse obs tables
                representation="sparse" if n_shards else "solve",
            )
        return self._run_solve(prob, mode, depth_loss_name, n_shards)

    def _build(self, bundle, mode, fix_pose, param_multiplier,
               allow_scale_filter, depth_type, representation="solve",
               device_depth=False):
        return build_ba_data(
            self.rec,
            bundle,
            mode=mode,
            fix_pose=fix_pose,
            reproj_loss_scale_mult=self.conf.reproj_loss_scale,
            depth_rob_scale=self.conf.rob_std,
            param_multiplier=param_multiplier,
            truncation_multiplier=self.truncation_multiplier,
            depth_type=depth_type,
            allow_scale_filter=allow_scale_filter and self.conf.scale_filter,
            scale_filter_factor=self.conf.scale_filter_factor,
            use_depth=self.conf.use_depth,
            representation=representation,
            device_depth=device_depth,
        )

    def _use_dist_ba(self, bundle, mode):
        if self.conf.dist_ba == "off" or mode != "global":
            return 0
        import jax

        n_dev = len(jax.devices())
        n = int(self.conf.dist_ba_shards) or n_dev
        n = min(n, n_dev)
        if n < 2:
            return 0
        if self.conf.dist_ba == "on":
            return n
        C = len(bundle["optim_ids"])
        return n if C >= int(self.conf.dist_ba_min_cams) else 0

    def _run_solve_dist(self, prob, mode, depth_loss_name, n_shards):
        """Global BA on the device mesh: point-block partition + shard_map
        LM with psum Schur reduction (the reference runs this through
        Ceres threads, mpsfm/sfm/mapper/base.py:476-514 — here the mesh is
        the scaling axis)."""
        from mpsfm_tpu.parallel.dist_ba import (
            make_mesh,
            partition_ba_data,
            solve_ba_block_sharded,
            unpartition_points,
        )

        self.dist_solves += 1
        parts, pids = partition_ba_data(prob.data, n_shards)
        mesh = make_mesh(n_shards, axis="blocks")
        quat, t, xyz_sh, info = solve_ba_block_sharded(
            parts, mesh,
            reproj_loss=losses.LOSS_IDS[self.conf.reproj_loss_name],
            depth_loss=losses.LOSS_IDS[depth_loss_name],
            max_iters=self.conf.max_iters,
        )
        cost = float(np.asarray(info["cost"]))
        if not np.isfinite(cost):
            return None, False
        P_n = int(np.asarray(prob.data.xyz).shape[0])
        if jax.process_count() > 1:
            # multi-host: the point shards live partly on other processes;
            # all-gather to a replicated array before the host read
            from jax.sharding import NamedSharding, PartitionSpec

            xyz_sh = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, PartitionSpec()))(
                xyz_sh
            )
        xyz = unpartition_points(np.asarray(xyz_sh), pids, P_n)
        apply_ba_result(self.rec, prob, np.asarray(quat), np.asarray(t), xyz)
        self.log(
            f"BA[{mode}/dist x{n_shards}] cost {float(np.asarray(info['cost0'])):.1f}"
            f" -> {cost:.1f} ({int(np.asarray(info['accepted']))} steps)",
            level=2,
        )
        return info, True

    def _run_solve(self, prob, mode, depth_loss_name, n_shards=0):
        if n_shards and prob.data is not None:
            return self._run_solve_dist(prob, mode, depth_loss_name, n_shards)
        if prob.dense is not None:
            from mpsfm_tpu.ba.dense import solve_ba_dense

            quat, t, xyz, info = solve_ba_dense(
                prob.dense,
                reproj_loss=losses.LOSS_IDS[self.conf.reproj_loss_name],
                depth_loss=losses.LOSS_IDS[depth_loss_name],
                max_iters=self.conf.max_iters,
            )
        else:
            quat, t, xyz, info = solve_ba(
                prob.data,
                reproj_loss=losses.LOSS_IDS[self.conf.reproj_loss_name],
                depth_loss=losses.LOSS_IDS[depth_loss_name],
                max_iters=self.conf.max_iters,
                cg_iters=self.conf.cg_iters,
            )
        # ONE device->host transfer for the whole result: separate
        # np.asarray/float() reads each pay the ~35-100 ms tunnel
        # round-trip; the mapper makes ~130 solver calls per scene.
        quat, t, xyz, scal = _fetch_result(quat, t, xyz, info["cost0"], info["cost"],
                                           info["accepted"])
        cost0, cost, accepted = float(scal[0]), float(scal[1]), int(scal[2])
        if not np.isfinite(cost):
            return None, False
        apply_ba_result(self.rec, prob, quat, t, xyz)
        self.log(
            f"BA[{mode}] cost {cost0:.1f} -> {cost:.1f} ({accepted} steps)",
            level=2,
        )
        info = {"cost0": cost0, "cost": cost, "accepted": accepted}
        return info, True

    def ba(self, bundle, mode="global", param_multiplier=1.0, allow_scale_filter=False, **kw):
        return self._solve(
            bundle, mode, fix_pose=False, depth_loss_name=self.conf.depth_loss_name,
            param_multiplier=param_multiplier, allow_scale_filter=allow_scale_filter,
        )

    def ba_fused(self, bundle, mode, z_getter, pending=None, param_multiplier=1.0,
                 allow_scale_filter=False, fix_pose=False, depth_type="update",
                 update_trunc=False, unc_overrides=None, pending_covs=None):
        """Integrate->BA chained solve: the depth-observation grids are
        derived ON DEVICE from the device-resident log-depth maps
        (ba/device_depth.py), so the whole refinement iteration — BiNI
        gate+solve, depth rows, LM-Schur BA, optional in-program MAD
        truncation multiplier — costs ONE blocking tunnel read
        (BA result + integration outputs fetched together).

        z_getter(imid) -> (log-depth grid device array, scalar shift).
        pending: integrate_bundle_deferred's finalize payload (its
        results ride the same read). Falls back to the classic path when
        the dense representation is unavailable (large/distributed
        bundles)."""
        import jax.numpy as jnp

        from mpsfm_tpu.scene.image_priors import finalize_integration
        from mpsfm_tpu.utils.profiling import TIMERS
        from mpsfm_tpu.utils.transport import fetch_many

        depth_loss_name = (
            self.conf.ref3d_loss_name if fix_pose else self.conf.depth_loss_name
        )
        n_shards = self._use_dist_ba(bundle, mode) if not fix_pose else 0
        prob = None
        if not n_shards:
            with TIMERS.phase("ba.build_data"):
                prob = self._build(
                    bundle, mode, fix_pose, param_multiplier, allow_scale_filter,
                    depth_type, representation="solve", device_depth=True,
                )
        if n_shards or prob is None or prob.dense is None:
            # fallback: finalize the deferred integration (one read), then
            # the classic path (host depth rows / distributed solver)
            from mpsfm_tpu.scene.image_priors import finalize_deferred_all

            finalize_deferred_all(pending, pending_covs)
            if update_trunc:
                with TIMERS.phase("truncation_multiplier"):
                    self.update_truncation_multiplier(self.rec.reg_image_ids())
            prob2 = self._build(
                bundle, mode, fix_pose, param_multiplier, allow_scale_filter,
                depth_type, representation="sparse" if n_shards else "solve",
            )
            return self._run_solve(prob2, mode, depth_loss_name, n_shards)

        from mpsfm_tpu.ba.device_depth import build_depth_grids, sample_logd

        specs = prob.depth_specs or {}
        dense = prob.dense
        Cb = int(dense.quat.shape[0])
        Pb = int(dense.xyz.shape[0])
        trunc_dev = None
        if specs.get("imids"):
            gx_dev = jnp.asarray(specs["gx"])
            gy_dev = jnp.asarray(specs["gy"])
            rows = []
            sig_rows = []
            kpi_dev = (
                jnp.asarray(specs["kp_ids"]) if unc_overrides else None
            )
            for r, imid in enumerate(specs["imids"]):
                z2d, shift = z_getter(imid)
                rows.append(sample_logd(z2d, jnp.float32(shift), gx_dev[r], gy_dev[r]))
                if unc_overrides and imid in unc_overrides:
                    # freshly chained int_covs variances (device rows)
                    sig_rows.append(unc_overrides[imid][kpi_dev[r]])
                else:
                    sig_rows.append(jnp.asarray(specs["sigma2"][r]))
            logd = jnp.stack(rows)
            sigma2_dev = jnp.stack(sig_rows)
            m_base = param_multiplier * self.conf.rob_std * (
                1.0 if update_trunc else self.truncation_multiplier
            )
            min_trunc = (
                self.conf.min_truncation_mult
                if self.conf.min_truncation_mult is not None
                else -1e30
            )
            d_logt, d_w, d_scale, trunc_dev = build_depth_grids(
                logd,
                sigma2_dev,
                jnp.asarray(specs["ptidx"]),
                jnp.asarray(specs["cam_rows"]),
                dense.quat, dense.t, dense.xyz,
                jnp.float32(m_base),
                jnp.float32(self.conf.scale_filter_factor),
                jnp.float32(min_trunc),
                C=Cb, P=Pb,
                scale_filter=bool(allow_scale_filter and self.conf.scale_filter),
                compute_trunc=bool(update_trunc),
            )
            dense = dense._replace(d_logt=d_logt, d_w=d_w, d_scale=d_scale)

        from mpsfm_tpu.ba.dense import solve_ba_dense

        with TIMERS.phase(f"ba[{mode}]"):
            quat, t, xyz, info = solve_ba_dense(
                dense,
                reproj_loss=losses.LOSS_IDS[self.conf.reproj_loss_name],
                depth_loss=losses.LOSS_IDS[depth_loss_name],
                max_iters=self.conf.max_iters,
            )
            arrays = [quat, t, xyz, info["cost0"], info["cost"], info["accepted"]]
            if trunc_dev is not None and update_trunc:
                arrays.append(trunc_dev)
            n_fixed = len(arrays)
            if pending:
                arrays += [info_dev for _, _z, info_dev in pending]
            uniq_v = {}
            if pending_covs:
                for entry in pending_covs:
                    uniq_v[id(entry[1])] = entry[1]
                arrays += list(uniq_v.values())
            fetched = fetch_many(arrays)
        changed_map = {}
        if pending:
            changed_map = finalize_integration(
                pending, fetched[n_fixed: n_fixed + len(pending)]
            )
        if pending_covs:
            from mpsfm_tpu.scene.image_priors import finalize_int_covs

            voff = n_fixed + (len(pending) if pending else 0)
            vmap_f = dict(zip(uniq_v.keys(), fetched[voff:]))
            finalize_int_covs(
                pending_covs, [vmap_f[id(e[1])] for e in pending_covs], changed_map
            )
        cost0 = float(fetched[3])
        cost = float(fetched[4])
        accepted = int(fetched[5])
        if trunc_dev is not None and update_trunc:
            self.truncation_multiplier = float(fetched[6])
        if not np.isfinite(cost):
            return None, False
        apply_ba_result(self.rec, prob, fetched[0], fetched[1], fetched[2])
        self.log(
            f"BA[{mode}/fused] cost {cost0:.1f} -> {cost:.1f} ({accepted} steps)",
            level=2,
        )
        return {"cost0": cost0, "cost": cost, "accepted": accepted}, True

    def refine_3d_points(self, bundle, depth_type="update", **kw):
        """Poses fixed, points refined with depth regularization
        (reference :276-283)."""
        import os

        if depth_type == "update" and os.environ.get("MPSFM_FUSED_REFINE", "1") == "1":
            # device-depth path: samples the depth targets from the
            # device-resident log-depth grids (no host depth build)
            def z_getter(imid):
                return self.rec.images[imid].priors._z0_shift_dev()

            return self.ba_fused(
                bundle, "global", z_getter, fix_pose=True, depth_type=depth_type
            )
        return self._solve(
            bundle, "global", fix_pose=True, depth_loss_name=self.conf.ref3d_loss_name,
            depth_type=depth_type,
        )

    def optimize_prior_shiftscale(self, bundle, allow_metric_scale_filter=False, **kw):
        from mpsfm_tpu.utils.profiling import TIMERS

        with TIMERS.phase("shift_scale"):
            return self._optimize_prior_shiftscale(bundle, allow_metric_scale_filter, **kw)

    def _optimize_prior_shiftscale(self, bundle, allow_metric_scale_filter=False, **kw):
        return _shift_scale(
            self.rec,
            bundle,
            allow_scale_filter=kw.get("allow_scale_filter", False),
            allow_metric_scale_filter=allow_metric_scale_filter,
            scale_filter=self.conf.scale_filter,
            scale_filter_factor=self.conf.scale_filter_factor,
            metric_scale_filter=self.conf.metric_scale_filter,
            single_rescale=self.conf.single_rescale,
            verbose=self.conf.verbose,
        )

    def calculate_point_covs(self, bundle):
        from mpsfm_tpu.utils.profiling import TIMERS

        with TIMERS.phase("point_covs"):
            return self._calculate_point_covs(bundle)

    def _calculate_point_covs(self, bundle):
        from mpsfm_tpu.utils.profiling import TIMERS

        with TIMERS.phase("point_covs.build"):
            prob = build_ba_data(
                self.rec, bundle, mode="global", use_depth=False, representation="sparse"
            )
        try:
            with TIMERS.phase("point_covs.device"):
                _calc_covs(self.rec, prob)
        except ValueError:
            # too many cameras for the dense reduced system: fall back to
            # per-point Hpp⁻¹ (ignores pose uncertainty)
            self._fallback_point_covs(bundle)

    def _fallback_point_covs(self, bundle):
        rec = self.rec
        for pid in bundle["pts3D"]:
            if not rec.alive[pid]:
                continue
            H = np.zeros((3, 3))
            kp_std = np.median([im.kp_std for im in rec.images.values()])
            for imid, kp in rec.tracks[pid]:
                im = rec.images[imid]
                cam = rec.camera(imid)
                X = rec.xyz[pid]
                p_cam = im.pose.transform(X[None])[0]
                z = max(p_cam[2], 1e-6)
                R = im.pose.rotation_matrix()
                # d(px)/dX = K_f * [1/z, 0, -x/z²; 0, 1/z, -y/z²] @ R
                J = (
                    np.array(
                        [
                            [cam.fx / z, 0, -cam.fx * p_cam[0] / z**2],
                            [0, cam.fy / z, -cam.fy * p_cam[1] / z**2],
                        ]
                    )
                    @ R
                )
                H += J.T @ J / kp_std**2
            rec.point_covs[int(pid)] = np.linalg.inv(H + 1e-8 * np.eye(3))

    def update_truncation_multiplier(self, imids):
        self.truncation_multiplier = _trunc(self.rec, imids, self.conf.min_truncation_mult)
