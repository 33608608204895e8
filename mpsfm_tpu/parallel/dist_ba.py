"""Multi-device bundle adjustment: camera-block/point-block shard_map LM.

The scaling design from SURVEY.md §2.2/§5 and PAPERS.md (MegBA-style
decomposition): points and their whole tracks are partitioned across the
device mesh, cameras are replicated; per LM iteration each device
assembles its shard's normal equations plus its dense 6Cx6C Schur
contribution, and the only cross-device traffic is psum(Hcc) +
psum(S_red) + psum(rhs/cost) — O(C^2), independent of observation count.

The same code path runs on the virtual CPU mesh in tests and on real
multi-chip slices — jax.distributed for multi-host changes only mesh
construction. (The round-1 obs-sharded GSPMD-layout path was removed in
round 3: it silently replicated non-divisible arrays and dropped the pc
coupling tables; this explicit decomposition supersedes it.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpsfm_tpu.ba.solver import BAData, solve_ba
from mpsfm_tpu.ba import losses


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ======================================================================
# Explicit camera-block / point-block decomposition (shard_map + psum)
# ======================================================================
#
# The north-star design (BASELINE.json; SURVEY.md §7.1; PAPERS.md MegBA):
# POINTS and their observations are partitioned across devices (a point's
# whole track lives on one shard), CAMERAS are replicated. Each device
# assembles its shard's normal equations and its dense contribution to
# the reduced camera (Schur) system; one psum produces the full 6Cx6C
# system, every device Cholesky-solves it (replicated), and point updates
# back-substitute locally. Per LM iteration the only cross-device traffic
# is psum(Hcc (C,6,6)) + psum(S_red (6C,6C)) + psum(rhs/cost) — O(C^2),
# independent of observation count, riding ICI inside a slice.

from functools import partial as _partial

from jax.sharding import PartitionSpec as _P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_new

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_new(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                              check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                              check_rep=False)


def _slot_tables_local(ids, valid_rows, P, K=None):
    """Slot tables (P, K) over the VALID rows only (padding rows never
    enter any segment), vectorized — no per-segment python loop."""
    idx = np.where(valid_rows)[0]
    ids_v = np.asarray(ids)[idx]
    counts = np.bincount(ids_v, minlength=P) if len(ids_v) else np.zeros(P, np.int64)
    Kmin = int(counts.max()) if len(ids_v) else 1
    K = max(Kmin, 1) if K is None else max(K, Kmin, 1)
    slots = np.zeros((P, K), np.int32)
    mask = np.zeros((P, K), np.float32)
    if len(ids_v):
        order = np.argsort(ids_v, kind="stable")
        sorted_ids = ids_v[order]
        starts = np.searchsorted(sorted_ids, sorted_ids)  # first pos of each id run
        pos = np.arange(len(sorted_ids)) - starts
        slots[sorted_ids, pos] = idx[order]
        mask[sorted_ids, pos] = 1.0
    return slots, mask


def partition_ba_data(data: BAData, n_shards: int):
    """Host-side partitioner: points (and their whole tracks) split across
    n_shards, balanced by observation count; per-shard obs re-packed
    camera-major. Returns (parts dict for solve_ba_block_sharded,
    point_ids list-of-arrays for unpartition_points)."""
    C = int(np.asarray(data.quat).shape[0])
    P_n = int(np.asarray(data.xyz).shape[0])
    r_pt = np.asarray(data.r_pt)
    r_valid = np.asarray(data.r_valid)
    d_pt = np.asarray(data.d_pt)
    d_valid = np.asarray(data.d_valid)
    No = len(r_pt)
    Nd = len(d_pt)
    Sc = No // C
    Sd = Nd // C if Nd else 0

    cnt = np.bincount(r_pt[r_valid > 0], minlength=P_n)
    if Nd:
        cnt = cnt + np.bincount(d_pt[d_valid > 0], minlength=P_n)
    order = np.argsort(-cnt, kind="stable")
    shard_of = np.empty(P_n, np.int32)
    shard_of[order] = np.arange(P_n) % n_shards  # round-robin over sorted counts

    point_ids = [np.where(shard_of == s)[0] for s in range(n_shards)]
    Pl = max(max(len(p) for p in point_ids), 1)

    # global -> local point index
    local_of = np.zeros(P_n, np.int64)
    for s, pids in enumerate(point_ids):
        local_of[pids] = np.arange(len(pids))

    # per-(shard, camera) row selection in the camera-major layout
    rows = np.arange(No)
    row_cam = rows // max(Sc, 1)
    r_sel = [
        [np.where((r_valid > 0) & (shard_of[r_pt] == s) & (row_cam == c))[0] for c in range(C)]
        for s in range(n_shards)
    ]
    Scl = max(max((len(x) for row in r_sel for x in row), default=1), 1)
    if Nd:
        drows = np.arange(Nd)
        drow_cam = drows // max(Sd, 1)
        d_sel = [
            [np.where((d_valid > 0) & (shard_of[d_pt] == s) & (drow_cam == c))[0] for c in range(C)]
            for s in range(n_shards)
        ]
        Sdl = max(max((len(x) for row in d_sel for x in row), default=1), 1)
    else:
        d_sel = [[np.zeros(0, np.int64)] * C for _ in range(n_shards)]
        Sdl = 1

    No_l, Nd_l = C * Scl, C * Sdl

    def np_(x):
        return np.asarray(x)

    sharded = {
        k: []
        for k in (
            "xyz", "point_var", "r_cam", "r_pt", "r_uv", "r_valid", "r_mag", "r_scale",
            "d_cam", "d_pt", "d_logtarget", "d_valid", "d_mag", "d_scale",
            "r_pt_slots", "r_pt_slot_mask", "d_pt_slots", "d_pt_slot_mask",
            "pc_r_slot", "pc_r_mask", "pc_d_slot", "pc_d_mask",
        )
    }
    # common slot-table widths across shards (static shapes)
    Kr = Kd = 1
    for s in range(n_shards):
        pc = np.bincount(local_of[r_pt[np.concatenate(r_sel[s])]], minlength=Pl) if any(len(x) for x in r_sel[s]) else np.zeros(1, np.int64)
        Kr = max(Kr, int(pc.max()) if pc.size else 1)
        if Nd:
            dc = np.bincount(local_of[d_pt[np.concatenate(d_sel[s])]], minlength=Pl) if any(len(x) for x in d_sel[s]) else np.zeros(1, np.int64)
            Kd = max(Kd, int(dc.max()) if dc.size else 1)

    for s in range(n_shards):
        pids = point_ids[s]
        xyz_l = np.zeros((Pl, 3), np.float32)
        xyz_l[:, 2] = 1.0
        pv_l = np.zeros(Pl, np.float32)
        xyz_l[: len(pids)] = np_(data.xyz)[pids]
        pv_l[: len(pids)] = np_(data.point_var)[pids]

        def pack(sel, N_l, S_l, src_pt, fields):
            out = {k: np.zeros((N_l, *v.shape[1:]), v.dtype) for k, v in fields.items()}
            out["_pt"] = np.zeros(N_l, np.int64)
            out["_valid"] = np.zeros(N_l, np.float32)
            for c in range(C):
                rs = sel[c]
                base = c * S_l
                out["_pt"][base : base + len(rs)] = local_of[src_pt[rs]]
                out["_valid"][base : base + len(rs)] = 1.0
                for k, v in fields.items():
                    out[k][base : base + len(rs)] = v[rs]
            return out

        rf = pack(
            r_sel[s], No_l, Scl, r_pt,
            {"uv": np_(data.r_uv), "mag": np_(data.r_mag), "scale": np_(data.r_scale)},
        )
        rf["scale"][rf["_valid"] == 0] = 1.0
        df = pack(
            d_sel[s], Nd_l, Sdl, d_pt,
            {"logtarget": np_(data.d_logtarget), "mag": np_(data.d_mag), "scale": np_(data.d_scale)},
        )
        df["scale"][df["_valid"] == 0] = 1.0

        r_slots, r_mask = _slot_tables_local(rf["_pt"], rf["_valid"] > 0, Pl, Kr)
        d_slots, d_mask = _slot_tables_local(df["_pt"], df["_valid"] > 0, Pl, Kd)
        # per-(point, camera) single-slot tables (dense Schur coupling)
        pc_r_slot = np.zeros((Pl, C), np.int32)
        pc_r_mask = np.zeros((Pl, C), np.float32)
        vr = np.where(rf["_valid"] > 0)[0]
        pc_r_slot[rf["_pt"][vr], vr // Scl] = vr
        pc_r_mask[rf["_pt"][vr], vr // Scl] = 1.0
        pc_d_slot = np.zeros((Pl, C), np.int32)
        pc_d_mask = np.zeros((Pl, C), np.float32)
        vd = np.where(df["_valid"] > 0)[0]
        pc_d_slot[df["_pt"][vd], vd // Sdl] = vd
        pc_d_mask[df["_pt"][vd], vd // Sdl] = 1.0

        sharded["xyz"].append(xyz_l)
        sharded["point_var"].append(pv_l)
        sharded["r_cam"].append((np.arange(No_l) // Scl).astype(np.int32))
        sharded["r_pt"].append(rf["_pt"].astype(np.int32))
        sharded["r_uv"].append(rf["uv"].astype(np.float32))
        sharded["r_valid"].append(rf["_valid"])
        sharded["r_mag"].append(rf["mag"].astype(np.float32))
        sharded["r_scale"].append(rf["scale"].astype(np.float32))
        sharded["d_cam"].append((np.arange(Nd_l) // Sdl).astype(np.int32))
        sharded["d_pt"].append(df["_pt"].astype(np.int32))
        sharded["d_logtarget"].append(df["logtarget"].astype(np.float32))
        sharded["d_valid"].append(df["_valid"])
        sharded["d_mag"].append(df["mag"].astype(np.float32))
        sharded["d_scale"].append(df["scale"].astype(np.float32))
        sharded["r_pt_slots"].append(r_slots)
        sharded["r_pt_slot_mask"].append(r_mask)
        sharded["d_pt_slots"].append(d_slots)
        sharded["d_pt_slot_mask"].append(d_mask)
        sharded["pc_r_slot"].append(pc_r_slot)
        sharded["pc_r_mask"].append(pc_r_mask)
        sharded["pc_d_slot"].append(pc_d_slot)
        sharded["pc_d_mask"].append(pc_d_mask)

    parts = {
        "repl": {
            "quat": np_(data.quat).astype(np.float32),
            "t": np_(data.t).astype(np.float32),
            "cam_dof": np_(data.cam_dof).astype(np.float32),
            "fx": np_(data.fx).astype(np.float32),
            "fy": np_(data.fy).astype(np.float32),
            "cx": np_(data.cx).astype(np.float32),
            "cy": np_(data.cy).astype(np.float32),
        },
        "shard": {k: np.stack(v) for k, v in sharded.items()},
    }

    # Explicit block-sparse Schur structure (VERDICT r4 item 3): build
    # per-shard pair tables with a GLOBAL camera-pair block adjacency so
    # psum(G_shard) reproduces the single-device explicit S exactly
    # (ba/schur_sparse.py — 3x the dense-coupling path at 512 cams
    # single-device). Falls back to the dense T path when too large.
    import os

    if os.environ.get("MPSFM_DIST_BS", "1") == "0":  # A/B + fallback gate
        return parts, point_ids

    from mpsfm_tpu.ba.schur_sparse import make_block_schur_tables_sharded

    shard_obs = [
        {
            "r_pt": parts["shard"]["r_pt"][s], "r_cam": parts["shard"]["r_cam"][s],
            "r_valid": parts["shard"]["r_valid"][s],
            "d_pt": parts["shard"]["d_pt"][s], "d_cam": parts["shard"]["d_cam"][s],
            "d_valid": parts["shard"]["d_valid"][s],
        }
        for s in range(n_shards)
    ]
    bs_built = make_block_schur_tables_sharded(shard_obs, Pl, C)
    if bs_built is not None:
        per_shard, shared = bs_built
        for key in ("uni_slots", "uni_mask", "pm_cam", "cam_slots", "cam_mask"):
            parts["shard"]["bs_" + key] = np.stack([ps[key] for ps in per_shard])
        nb = len(per_shard[0]["con_a"])
        parts["n_bs_buckets"] = nb
        for i in range(nb):
            for key in ("con_a", "con_b", "con_mask"):
                parts["shard"][f"bs_{key}{i}"] = np.stack(
                    [ps[key][i] for ps in per_shard]
                )
        for key, v in shared.items():
            parts["repl"]["bs_" + key] = v
        # the dense (Pl, C, 6, 3) T coupling table is superseded — drop
        # the pc slot tables so _assemble_ne skips building it
        for key in ("pc_r_slot", "pc_r_mask", "pc_d_slot", "pc_d_mask"):
            del parts["shard"][key]
    return parts, point_ids


def unpartition_points(xyz_sharded, point_ids, P_n):
    """(n_shards*Pl, 3) solver output -> (P, 3) in original point order."""
    xyz_sharded = np.asarray(xyz_sharded)
    if xyz_sharded.ndim == 3:  # (n_shards, Pl, 3)
        xyz_sharded = xyz_sharded.reshape(-1, 3)
    n_shards = len(point_ids)
    Pl = xyz_sharded.shape[0] // n_shards
    out = np.zeros((P_n, 3), xyz_sharded.dtype)
    for s, pids in enumerate(point_ids):
        out[pids] = xyz_sharded[s * Pl : s * Pl + len(pids)]
    return out


def _local_ba_data(repl, shard) -> BAData:
    return BAData(
        quat=repl["quat"], t=repl["t"], cam_dof=repl["cam_dof"],
        fx=repl["fx"], fy=repl["fy"], cx=repl["cx"], cy=repl["cy"],
        xyz=shard["xyz"], point_var=shard["point_var"],
        r_cam=shard["r_cam"], r_pt=shard["r_pt"], r_uv=shard["r_uv"],
        r_valid=shard["r_valid"], r_mag=shard["r_mag"], r_scale=shard["r_scale"],
        d_cam=shard["d_cam"], d_pt=shard["d_pt"], d_logtarget=shard["d_logtarget"],
        d_valid=shard["d_valid"], d_mag=shard["d_mag"], d_scale=shard["d_scale"],
        r_pt_slots=shard["r_pt_slots"], r_pt_slot_mask=shard["r_pt_slot_mask"],
        d_pt_slots=shard["d_pt_slots"], d_pt_slot_mask=shard["d_pt_slot_mask"],
        pc_r_slot=shard.get("pc_r_slot"), pc_r_mask=shard.get("pc_r_mask"),
        pc_d_slot=shard.get("pc_d_slot"), pc_d_mask=shard.get("pc_d_mask"),
    )


def _local_bs_tables(repl, shard, n_buckets):
    """Reassemble a BlockSchurTables view from the split repl/shard dicts
    (shared adjacency replicated, pair tables shard-local)."""
    from mpsfm_tpu.ba.schur_sparse import BlockSchurTables

    return BlockSchurTables(
        uni_slots=shard["bs_uni_slots"], uni_mask=shard["bs_uni_mask"],
        con_a=tuple(shard[f"bs_con_a{i}"] for i in range(n_buckets)),
        con_b=tuple(shard[f"bs_con_b{i}"] for i in range(n_buckets)),
        con_mask=tuple(shard[f"bs_con_mask{i}"] for i in range(n_buckets)),
        blk_rows=repl["bs_blk_rows"], blk_cols=repl["bs_blk_cols"],
        diag_ids=repl["bs_diag_ids"], diag_mask=repl["bs_diag_mask"],
        row_slots=repl["bs_row_slots"], row_mask=repl["bs_row_mask"],
        colT_slots=repl["bs_colT_slots"], colT_mask=repl["bs_colT_mask"],
        pm_cam=shard["bs_pm_cam"],
        cam_slots=shard["bs_cam_slots"], cam_mask=shard["bs_cam_mask"],
    )


def solve_ba_block_sharded(
    parts,
    mesh: Mesh,
    reproj_loss: int = losses.SOFT_L1,
    depth_loss: int = losses.CAUCHY,
    max_iters: int = 20,
    lm_lambda0: float = 1e-4,
    rel_tol: float = 1e-6,
):
    """LM-Schur BA over a device mesh with explicit shard_map collectives.

    parts from partition_ba_data. Returns (quat, t, xyz_stacked, info);
    xyz_stacked is (n_shards*Pl, 3) sharded along the mesh axis — map back
    with unpartition_points. Camera state and the LM control flow are
    replicated; all cross-shard reductions are explicit psums.
    """
    from mpsfm_tpu.ba.schur_sparse import (
        build_schur_blocks,
        pm_backsub,
        pm_coupling_table,
        pm_reduced_rhs,
        schur_cg_blocks,
    )
    from mpsfm_tpu.ba.solver import (
        _apply_cam_update,
        _assemble_ne,
        _cost_only,
        inv3x3,
    )

    # shard along the LAST mesh axis; any leading axes (e.g. a multi-host
    # "replica" axis from make_2d_mesh) stay replicated — psums ride the
    # block axis only, so replicas compute identical results with zero
    # cross-replica traffic.
    axis = mesh.axis_names[-1]
    dtype = jnp.float32
    n_bs_buckets = parts.get("n_bs_buckets", 0)
    use_bs = n_bs_buckets > 0 and "bs_uni_slots" in parts["shard"]

    def body(repl, shard):
        repl = jax.tree.map(lambda x: x, repl)
        shard = jax.tree.map(lambda x: x[0], shard)  # local block
        ld = _local_ba_data(repl, shard)
        bs = _local_bs_tables(repl, shard, n_bs_buckets) if use_bs else None
        C = ld.quat.shape[0]
        Pl = ld.xyz.shape[0]
        No, Nd = ld.r_cam.shape[0], ld.d_cam.shape[0]

        def cost_of(quat, t, xyz):
            return jax.lax.psum(_cost_only(ld, quat, t, xyz, reproj_loss, depth_loss), axis)

        def ne_of(quat, t, xyz):
            return _assemble_ne(ld, quat, t, xyz, reproj_loss, depth_loss)

        def step(carry, _):
            quat, t, xyz, lam, cost, done, accepted, ne = carry
            Hcc_l, Hpp, g_c_l, g_p, Wr_rows, Wd_rows, T = ne
            Hcc = jax.lax.psum(Hcc_l, axis)
            g_c = jax.lax.psum(g_c_l, axis)

            dc = jnp.einsum("cii->ci", Hcc)
            dp = jnp.einsum("pii->pi", Hpp)
            eye6 = jnp.eye(6, dtype=dtype)
            eye3 = jnp.eye(3, dtype=dtype)
            frozen_c = 1.0 - ld.cam_dof
            Hcc_aug = Hcc + jnp.einsum("ci,ij->cij", lam * dc + 1e-8 + frozen_c, eye6) * eye6
            frozen_p = 1.0 - ld.point_var
            Hpp_aug = Hpp + jnp.einsum(
                "pi,ij->pij", lam * dp + 1e-8 + frozen_p[:, None] * jnp.ones(3, dtype), eye3
            ) * eye3
            Hpp_inv = inv3x3(Hpp_aug)

            if use_bs:
                # explicit block-sparse S (ba/schur_sparse.py): each shard
                # builds its pair blocks against the GLOBAL adjacency and
                # ONE psum(G) replicates the full covisibility structure —
                # O(B·36) traffic and ~obs·pairs·108 flops instead of the
                # dense (6C,3Pl)x(3Pl,6C) contraction per shard
                Vpm = pm_coupling_table(Wr_rows, Wd_rows, bs)
                G = jax.lax.psum(build_schur_blocks(Vpm, Hpp_inv, bs), axis)
                red_l, hp = pm_reduced_rhs(Vpm, Hpp_inv, jnp.zeros_like(g_c), g_p, bs)
                rhs = -(g_c - jax.lax.psum(red_l, axis))
                delta_c, _cg_used = schur_cg_blocks(
                    G, bs, Hcc_aug, rhs, max(64, 2 * C), 1e-3
                )
                delta_c = delta_c * ld.cam_dof
                delta_p = pm_backsub(Vpm, Hpp_inv, g_p, delta_c, ld.point_var, bs)
            else:
                Wr = Wr_rows.reshape(No, 6, 3)
                Wd = Wd_rows.reshape(Nd, 6, 3)
                hp = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)
                red_r = (Wr * hp[ld.r_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
                red_d = (Wd * hp[ld.d_pt][:, None, :]).sum(-1).reshape(C, -1, 6).sum(1)
                rhs = -(g_c - jax.lax.psum(red_r + red_d, axis))

                # local dense Schur contribution + psum -> replicated 6Cx6C
                U = T.reshape(Pl, C * 6, 3)
                TB = jnp.einsum("pkl,plm->pkm", U, Hpp_inv)
                S_red_l = jax.lax.dot_general(
                    TB, U, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
                    preferred_element_type=dtype,
                )
                S_red = jax.lax.psum(S_red_l, axis)
                Hcc_full = jnp.zeros((C, 6, C, 6), dtype)
                ii = jnp.arange(C)
                Hcc_full = Hcc_full.at[ii, :, ii, :].set(Hcc_aug).reshape(6 * C, 6 * C)
                S = Hcc_full - S_red
                chol = jax.scipy.linalg.cho_factor(S + 1e-7 * jnp.eye(6 * C, dtype=dtype))
                delta_c = jax.scipy.linalg.cho_solve(chol, rhs.reshape(6 * C)).reshape(C, 6)
                delta_c = delta_c * ld.cam_dof

                # local back-substitution
                dce = jnp.broadcast_to(delta_c[:, None, :], (C, No // C, 6)).reshape(No, 6)
                dde = jnp.broadcast_to(delta_c[:, None, :], (C, Nd // C, 6)).reshape(Nd, 6)
                wtd_r = (Wr * dce[:, :, None]).sum(1)
                wtd_d = (Wd * dde[:, :, None]).sum(1)
                wtd = (wtd_r[ld.r_pt_slots] * ld.r_pt_slot_mask[..., None]).sum(1)
                wtd = wtd + (wtd_d[ld.d_pt_slots] * ld.d_pt_slot_mask[..., None]).sum(1)
                delta_p = -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + wtd) * ld.point_var[:, None]

            quat_new, t_new = _apply_cam_update(quat, t, delta_c)
            xyz_new = xyz + delta_p
            new_cost = cost_of(quat_new, t_new, xyz_new)

            improved = (new_cost < cost) & jnp.isfinite(new_cost)
            take = improved & ~done
            quat = jnp.where(take, quat_new, quat)
            t = jnp.where(take, t_new, t)
            xyz = jnp.where(take, xyz_new, xyz)
            lam = jnp.where(
                done, lam,
                jnp.where(improved, jnp.maximum(lam / 3.0, 1e-10), jnp.minimum(lam * 10.0, 1e6)),
            )
            rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-30)
            done = done | (improved & (rel < rel_tol))
            cost = jnp.where(take, new_cost, cost)
            accepted = accepted + take.astype(jnp.int32)
            ne = jax.lax.cond(take, lambda: ne_of(quat, t, xyz), lambda: ne)
            return (quat, t, xyz, lam, cost, done, accepted, ne), cost

        cost0 = cost_of(ld.quat, ld.t, ld.xyz)
        init = (
            ld.quat, ld.t, ld.xyz, jnp.asarray(lm_lambda0, dtype), cost0,
            jnp.asarray(False), jnp.asarray(0, jnp.int32),
            ne_of(ld.quat, ld.t, ld.xyz),
        )
        (quat, t, xyz, lam, cost, done, accepted, _), cost_hist = jax.lax.scan(
            step, init, None, length=max_iters
        )
        return quat, t, xyz[None], cost0, cost, accepted, cost_hist

    fn = _shard_map(
        body,
        mesh,
        in_specs=(jax.tree.map(lambda _: _P(), parts["repl"]),
                  jax.tree.map(lambda _: _P(axis), parts["shard"])),
        out_specs=(_P(), _P(), _P(axis), _P(), _P(), _P(), _P()),
    )
    repl_sh = NamedSharding(mesh, P())
    shard_sh = NamedSharding(mesh, P(axis))
    repl_dev = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl_sh), parts["repl"])
    shard_dev = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), shard_sh), parts["shard"])
    with mesh:
        quat, t, xyz, cost0, cost, accepted, hist = jax.jit(fn)(repl_dev, shard_dev)
    info = {"cost0": cost0, "cost": cost, "accepted": accepted, "cost_history": hist}
    return quat, t, xyz, info
