"""Explicit block-sparse Schur complement for the large-scene BA path.

The matrix-free Schur PCG pays two dynamic gathers over ALL observation
rows per CG iteration (~7.7 ms/iter at 512 cams / 860k obs on v5e —
scripts/bench_ba_large_parts.py). The standard sparse-solver answer
(Ceres SPARSE_SCHUR, reference mpsfm/sfm/mapper/bundle_adjustment.py:285-293)
is to *form* the reduced camera system explicitly: S has one 6x6 block per
covisible camera pair, and real scenes are covisibility-sparse, so the
explicit S is tiny (B ~ C * avg-covisibility blocks).

TPU formulation (no scatters anywhere):

  host prep (once per problem, pure numpy):
    * unified obs list = reproj ++ depth rows; per-point padded slot
      table ``uni_slots (P, Tu)`` (point-major layout of the coupling
      rows W);
    * every within-point ordered obs pair (a, b), canonicalised to
      cam(a) <= cam(b) (swapping (a,b) transposes the block, so the
      canonical block accumulates exactly the upper-triangle sum);
      grouped by camera-pair block into ``con_a/con_b (B, Kmax)`` slot
      tables;
    * per-camera block lists ``row_slots/colT_slots (C, R)`` for the
      gather-based symmetric block matvec.

  device, per LM iteration:
    * V = [Wr; Wd][uni_slots] · chol(Hpp_inv)  — one obs-row gather;
    * G_bl = Σ_k V[con_a] V[con_b]ᵀ           — two (B·Kmax) row gathers
      + one batched (6,3K)x(3K,6) MXU contraction → S blocks (B,6,6);
    * CG runs entirely on the explicit blocks: a matvec is two (B,)-row
      gathers of x plus two (C,R)-slot gathers of block products —
      microseconds instead of two all-observation gathers.

S(λ) depends on λ through Hpp's augmentation, so blocks are rebuilt per
LM iteration — the rebuild is a fixed ~tens-of-ms cost that replaces
~250 ms of capped PCG.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BlockSchurTables(NamedTuple):
    """Host-precomputed structure of the explicit block-sparse S."""

    # point-major unified coupling-row layout
    uni_slots: jnp.ndarray  # (P, Tu) int32 into [reproj ++ depth] rows
    uni_mask: jnp.ndarray  # (P, Tu) f32
    # per-block contribution pair tables (indices into the flattened
    # (P*Tu,) point-major V table), bucketed by power-of-two pair count:
    # tuple of (Bb, Kb) arrays, blocks sorted by descending count
    con_a: tuple  # of (Bb, Kb) int32
    con_b: tuple  # of (Bb, Kb) int32
    con_mask: tuple  # of (Bb, Kb) f32
    # block adjacency
    blk_rows: jnp.ndarray  # (B,) int32 camera row (<= col)
    blk_cols: jnp.ndarray  # (B,) int32 camera col
    diag_ids: jnp.ndarray  # (C,) int32 block id of (c,c); 0 if absent
    diag_mask: jnp.ndarray  # (C,) f32
    # symmetric matvec slot tables
    row_slots: jnp.ndarray  # (C, R1) int32 block ids with row == c
    row_mask: jnp.ndarray  # (C, R1) f32
    colT_slots: jnp.ndarray  # (C, R2) int32 block ids with col == c, row < col
    colT_mask: jnp.ndarray  # (C, R2) f32
    # point-major-row <-> camera mapping (reduced-rhs / back-substitution
    # in the SAME layout as the block build, so the W tables have one
    # consumer layout)
    pm_cam: jnp.ndarray  # (P*Tu,) int32 camera of each pm row (0 padded)
    cam_slots: jnp.ndarray  # (C, Rc) int32 pm-row ids of camera c
    cam_mask: jnp.ndarray  # (C, Rc) f32


def make_block_schur_tables(
    r_pt,
    r_cam,
    r_valid,
    d_pt,
    d_cam,
    d_valid,
    num_points: int,
    num_cams: int,
    max_pair_elems: int = 256_000_000,
    max_block_elems: int = 64_000_000,
):
    """Build BlockSchurTables on the host. Returns None when the pair
    enumeration or the padded block tables would be too large (caller
    falls back to the matrix-free PCG)."""
    r_pt = np.asarray(r_pt, np.int64)
    d_pt = np.asarray(d_pt, np.int64)
    No = len(r_pt)
    obs_pt = np.concatenate([r_pt, d_pt])
    obs_cam = np.concatenate([np.asarray(r_cam, np.int64), np.asarray(d_cam, np.int64)])
    obs_valid = np.concatenate([np.asarray(r_valid) > 0, np.asarray(d_valid) > 0])

    idx = np.nonzero(obs_valid)[0]
    if len(idx) == 0:
        return None
    pt = obs_pt[idx]
    cam = obs_cam[idx]
    order = np.argsort(pt, kind="stable")
    pt_s, cam_s, obs_s = pt[order], cam[order], idx[order]
    counts = np.bincount(pt_s, minlength=num_points)
    Tu = int(counts.max())
    if Tu == 0 or num_points * Tu * Tu > max_pair_elems:
        return None

    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = pt_s * Tu + (np.arange(len(pt_s)) - starts[pt_s])
    uni_slots = np.zeros((num_points * Tu,), np.int32)
    uni_mask = np.zeros((num_points * Tu,), np.float32)
    uni_cam = np.full((num_points * Tu,), -1, np.int64)
    uni_slots[flat] = obs_s.astype(np.int32)
    uni_mask[flat] = 1.0
    uni_cam[flat] = cam_s
    uni_slots = uni_slots.reshape(num_points, Tu)
    uni_mask = uni_mask.reshape(num_points, Tu)
    uni_cam = uni_cam.reshape(num_points, Tu)

    # ---- canonical within-point obs pairs --------------------------------
    m2 = (uni_mask.reshape(num_points, Tu, 1) * uni_mask.reshape(num_points, 1, Tu)) > 0
    ca = np.broadcast_to(uni_cam[:, :, None], (num_points, Tu, Tu))
    cb = np.broadcast_to(uni_cam[:, None, :], (num_points, Tu, Tu))
    keep = m2 & (ca <= cb)
    p_i, k_i, l_i = np.nonzero(keep)
    a_flat = (p_i * Tu + k_i).astype(np.int32)
    b_flat = (p_i * Tu + l_i).astype(np.int32)
    bkey = ca[keep] * num_cams + cb[keep]

    ukeys, binv = np.unique(bkey, return_inverse=True)
    B = len(ukeys)
    blk_rows = (ukeys // num_cams).astype(np.int32)
    blk_cols = (ukeys % num_cams).astype(np.int32)
    bcounts = np.bincount(binv, minlength=B)
    Kmax = int(bcounts.max())
    if B * Kmax > max_block_elems:
        return None

    # ---- bucket blocks by contribution count -----------------------------
    # Gathers run at ~4.5 GB/s on TPU regardless of access pattern, so the
    # (B, Kmax) padding waste (~2.2x on track-6 scenes: diagonal blocks
    # have ~10x the contributions of distant off-diagonals) is pure gather
    # time. Reorder blocks by descending count and emit one padded table
    # per power-of-two width bucket.
    border = np.argsort(-bcounts, kind="stable")
    inv_border = np.empty(B, np.int64)
    inv_border[border] = np.arange(B)
    binv = inv_border[binv]
    blk_rows = blk_rows[border]
    blk_cols = blk_cols[border]
    bcounts = bcounts[border]  # descending
    widths = np.maximum(8, 2 ** np.ceil(np.log2(np.maximum(bcounts, 1))).astype(np.int64))
    bounds = [0] + [i for i in range(1, B) if widths[i] != widths[i - 1]] + [B]

    order2 = np.argsort(binv, kind="stable")
    bstarts = np.concatenate([[0], np.cumsum(np.bincount(binv, minlength=B))[:-1]])
    a_s, b_s, binv_s = a_flat[order2], b_flat[order2], binv[order2]
    offs = np.arange(len(binv_s)) - bstarts[binv_s]
    con_a, con_b, con_mask = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        Kb = int(widths[s])
        nb = e - s
        sel = (binv_s >= s) & (binv_s < e)
        rows_b = (binv_s[sel] - s) * Kb + offs[sel]
        ta = np.zeros((nb * Kb,), np.int32)
        tb = np.zeros((nb * Kb,), np.int32)
        tm = np.zeros((nb * Kb,), np.float32)
        ta[rows_b] = a_s[sel]
        tb[rows_b] = b_s[sel]
        tm[rows_b] = 1.0
        con_a.append(ta.reshape(nb, Kb))
        con_b.append(tb.reshape(nb, Kb))
        con_mask.append(tm.reshape(nb, Kb))

    # ---- block adjacency tables ------------------------------------------
    diag_ids = np.zeros((num_cams,), np.int32)
    diag_mask = np.zeros((num_cams,), np.float32)
    is_diag = blk_rows == blk_cols
    diag_ids[blk_rows[is_diag]] = np.nonzero(is_diag)[0].astype(np.int32)
    diag_mask[blk_rows[is_diag]] = 1.0

    def group(ids_of_blocks, sel):
        sel_ids = np.nonzero(sel)[0]
        cams = ids_of_blocks[sel]
        cnt = np.bincount(cams, minlength=num_cams)
        R = max(int(cnt.max()), 1)
        slots = np.zeros((num_cams * R,), np.int32)
        mask = np.zeros((num_cams * R,), np.float32)
        o = np.argsort(cams, kind="stable")
        st = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        rr = cams[o] * R + (np.arange(len(cams)) - st[cams[o]])
        slots[rr] = sel_ids[o].astype(np.int32)
        mask[rr] = 1.0
        return slots.reshape(num_cams, R), mask.reshape(num_cams, R)

    row_slots, row_mask = group(blk_rows, np.ones(B, bool))
    colT_slots, colT_mask = group(blk_cols, blk_rows < blk_cols)

    # pm-row -> camera tables for rhs/backsub
    pm_cam = np.maximum(uni_cam.reshape(-1), 0).astype(np.int32)
    pm_valid = uni_mask.reshape(-1) > 0
    vrows = np.nonzero(pm_valid)[0]
    vcams = pm_cam[vrows]
    ccnt = np.bincount(vcams, minlength=num_cams)
    Rc = max(int(ccnt.max()), 1)
    cam_slots = np.zeros((num_cams * Rc,), np.int32)
    cam_mask = np.zeros((num_cams * Rc,), np.float32)
    co = np.argsort(vcams, kind="stable")
    cst = np.concatenate([[0], np.cumsum(ccnt)[:-1]])
    crr = vcams[co] * Rc + (np.arange(len(vcams)) - cst[vcams[co]])
    cam_slots[crr] = vrows[co].astype(np.int32)
    cam_mask[crr] = 1.0

    return BlockSchurTables(
        uni_slots=jnp.asarray(uni_slots),
        uni_mask=jnp.asarray(uni_mask),
        con_a=tuple(jnp.asarray(a) for a in con_a),
        con_b=tuple(jnp.asarray(b) for b in con_b),
        con_mask=tuple(jnp.asarray(m) for m in con_mask),
        blk_rows=jnp.asarray(blk_rows),
        blk_cols=jnp.asarray(blk_cols),
        diag_ids=jnp.asarray(diag_ids),
        diag_mask=jnp.asarray(diag_mask),
        row_slots=jnp.asarray(row_slots),
        row_mask=jnp.asarray(row_mask),
        colT_slots=jnp.asarray(colT_slots),
        colT_mask=jnp.asarray(colT_mask),
        pm_cam=jnp.asarray(pm_cam),
        cam_slots=jnp.asarray(cam_slots.reshape(num_cams, Rc)),
        cam_mask=jnp.asarray(cam_mask.reshape(num_cams, Rc)),
    )


def make_block_schur_tables_sharded(shard_obs, num_points_local, num_cams,
                                    max_pair_elems: int = 256_000_000,
                                    max_block_elems: int = 64_000_000):
    """Per-shard BlockSchurTables with a GLOBAL block adjacency.

    ``shard_obs``: list (one per shard) of dicts with keys r_pt, r_cam,
    r_valid, d_pt, d_cam, d_valid — the shard's packed LOCAL observation
    tables (point indices local to the shard's point block). All shards
    get IDENTICAL table shapes (shared Tu / bucket widths / Rc), so the
    results stack into shard_map operands; blk/diag/row/colT adjacency
    is identical across shards (points are partitioned, so the union of
    per-shard camera-pair blocks is the full problem's block set and
    psum(G_shard) reproduces the single-device explicit S exactly).
    Returns (per_shard list of numpy BlockSchurTables-field dicts,
    shared adjacency dict) or None when the tables would be too large.
    """
    S = len(shard_obs)
    pre = []
    Tu = 1
    for so in shard_obs:
        pt = np.concatenate([np.asarray(so["r_pt"], np.int64), np.asarray(so["d_pt"], np.int64)])
        cam = np.concatenate([np.asarray(so["r_cam"], np.int64), np.asarray(so["d_cam"], np.int64)])
        valid = np.concatenate([np.asarray(so["r_valid"]) > 0, np.asarray(so["d_valid"]) > 0])
        idx = np.nonzero(valid)[0]
        counts = np.bincount(pt[idx], minlength=num_points_local) if len(idx) else np.zeros(num_points_local, np.int64)
        Tu = max(Tu, int(counts.max()) if counts.size else 1)
        pre.append((pt, cam, idx, counts))
    if num_points_local * Tu * Tu > max_pair_elems // max(S, 1):
        return None

    # pass 1: per-shard uni tables + pair block keys
    shard_uni = []
    shard_pairs = []
    all_keys = []
    for pt, cam, idx, counts in pre:
        pt_v, cam_v = pt[idx], cam[idx]
        order = np.argsort(pt_v, kind="stable")
        pt_s, cam_s, obs_s = pt_v[order], cam_v[order], idx[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        flat = pt_s * Tu + (np.arange(len(pt_s)) - starts[pt_s])
        uni_slots = np.zeros((num_points_local * Tu,), np.int32)
        uni_mask = np.zeros((num_points_local * Tu,), np.float32)
        uni_cam = np.full((num_points_local * Tu,), -1, np.int64)
        uni_slots[flat] = obs_s.astype(np.int32)
        uni_mask[flat] = 1.0
        uni_cam[flat] = cam_s
        um = uni_mask.reshape(num_points_local, Tu)
        uc = uni_cam.reshape(num_points_local, Tu)
        m2 = (um[:, :, None] * um[:, None, :]) > 0
        ca = np.broadcast_to(uc[:, :, None], m2.shape)
        cb = np.broadcast_to(uc[:, None, :], m2.shape)
        keep = m2 & (ca <= cb)
        p_i, k_i, l_i = np.nonzero(keep)
        a_flat = (p_i * Tu + k_i).astype(np.int32)
        b_flat = (p_i * Tu + l_i).astype(np.int32)
        bkey = ca[keep] * num_cams + cb[keep]
        shard_uni.append((uni_slots.reshape(num_points_local, Tu),
                          um, uc))
        shard_pairs.append((a_flat, b_flat, bkey))
        all_keys.append(np.unique(bkey))

    ukeys = np.unique(np.concatenate(all_keys)) if all_keys else np.zeros(0, np.int64)
    B = len(ukeys)
    if B == 0:
        return None
    # per-block max count over shards drives the shared bucket widths
    maxcnt = np.zeros(B, np.int64)
    shard_binv = []
    for a_flat, b_flat, bkey in shard_pairs:
        binv = np.searchsorted(ukeys, bkey)
        shard_binv.append(binv)
        cnt = np.bincount(binv, minlength=B)
        maxcnt = np.maximum(maxcnt, cnt)
    border = np.argsort(-maxcnt, kind="stable")
    inv_border = np.empty(B, np.int64)
    inv_border[border] = np.arange(B)
    blk_rows = (ukeys[border] // num_cams).astype(np.int32)
    blk_cols = (ukeys[border] % num_cams).astype(np.int32)
    maxcnt = maxcnt[border]
    widths = np.maximum(8, 2 ** np.ceil(np.log2(np.maximum(maxcnt, 1))).astype(np.int64))
    bounds = [0] + [i for i in range(1, B) if widths[i] != widths[i - 1]] + [B]
    if int((widths * 1).sum()) * 1 and B * int(widths[0]) > max_block_elems:
        return None

    per_shard = []
    for s in range(S):
        uni_slots, um, uc = shard_uni[s]
        a_flat, b_flat, bkey = shard_pairs[s]
        binv = inv_border[shard_binv[s]]
        order2 = np.argsort(binv, kind="stable")
        bcnt = np.bincount(binv, minlength=B)
        bstarts = np.concatenate([[0], np.cumsum(bcnt)[:-1]])
        a_s, b_s, binv_s = a_flat[order2], b_flat[order2], binv[order2]
        offs = np.arange(len(binv_s)) - bstarts[binv_s]
        con_a, con_b, con_mask = [], [], []
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            Kb = int(widths[s0])
            nb = e0 - s0
            sel = (binv_s >= s0) & (binv_s < e0)
            rows_b = (binv_s[sel] - s0) * Kb + offs[sel]
            ta = np.zeros((nb * Kb,), np.int32)
            tb = np.zeros((nb * Kb,), np.int32)
            tm = np.zeros((nb * Kb,), np.float32)
            ta[rows_b] = a_s[sel]
            tb[rows_b] = b_s[sel]
            tm[rows_b] = 1.0
            con_a.append(ta.reshape(nb, Kb))
            con_b.append(tb.reshape(nb, Kb))
            con_mask.append(tm.reshape(nb, Kb))
        per_shard.append({
            "uni_slots": uni_slots, "uni_mask": um,
            "con_a": tuple(con_a), "con_b": tuple(con_b), "con_mask": tuple(con_mask),
            "uni_cam": uc,
        })

    # shared adjacency
    diag_ids = np.zeros((num_cams,), np.int32)
    diag_mask = np.zeros((num_cams,), np.float32)
    is_diag = blk_rows == blk_cols
    diag_ids[blk_rows[is_diag]] = np.nonzero(is_diag)[0].astype(np.int32)
    diag_mask[blk_rows[is_diag]] = 1.0

    def group(ids_of_blocks, sel):
        sel_ids = np.nonzero(sel)[0]
        cams = ids_of_blocks[sel]
        cnt = np.bincount(cams, minlength=num_cams)
        R = max(int(cnt.max()), 1)
        slots = np.zeros((num_cams * R,), np.int32)
        mask = np.zeros((num_cams * R,), np.float32)
        o = np.argsort(cams, kind="stable")
        st = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        rr = cams[o] * R + (np.arange(len(cams)) - st[cams[o]])
        slots[rr] = sel_ids[o].astype(np.int32)
        mask[rr] = 1.0
        return slots.reshape(num_cams, R), mask.reshape(num_cams, R)

    row_slots, row_mask = group(blk_rows, np.ones(B, bool))
    colT_slots, colT_mask = group(blk_cols, blk_rows < blk_cols)
    shared = {
        "blk_rows": blk_rows, "blk_cols": blk_cols,
        "diag_ids": diag_ids, "diag_mask": diag_mask,
        "row_slots": row_slots, "row_mask": row_mask,
        "colT_slots": colT_slots, "colT_mask": colT_mask,
    }

    # per-shard pm-row -> camera tables (shared Rc)
    Rc = 1
    for ps in per_shard:
        pm_valid = ps["uni_mask"].reshape(-1) > 0
        vcams = np.maximum(ps["uni_cam"].reshape(-1), 0)[pm_valid]
        cnt = np.bincount(vcams, minlength=num_cams) if len(vcams) else np.zeros(num_cams, np.int64)
        Rc = max(Rc, int(cnt.max()) if cnt.size else 1)
    for ps in per_shard:
        uni_cam = ps.pop("uni_cam")
        pm_cam = np.maximum(uni_cam.reshape(-1), 0).astype(np.int32)
        pm_valid = ps["uni_mask"].reshape(-1) > 0
        vrows = np.nonzero(pm_valid)[0]
        vcams = pm_cam[vrows]
        ccnt = np.bincount(vcams, minlength=num_cams) if len(vcams) else np.zeros(num_cams, np.int64)
        cam_slots = np.zeros((num_cams * Rc,), np.int32)
        cam_mask = np.zeros((num_cams * Rc,), np.float32)
        if len(vcams):
            co = np.argsort(vcams, kind="stable")
            cst = np.concatenate([[0], np.cumsum(ccnt)[:-1]])
            crr = vcams[co] * Rc + (np.arange(len(vcams)) - cst[vcams[co]])
            cam_slots[crr] = vrows[co].astype(np.int32)
            cam_mask[crr] = 1.0
        ps["pm_cam"] = pm_cam
        ps["cam_slots"] = cam_slots.reshape(num_cams, Rc)
        ps["cam_mask"] = cam_mask.reshape(num_cams, Rc)

    return per_shard, shared


def _chol3x3(M, eps=0.0):
    """Closed-form batched Cholesky of (., 3, 3) SPD matrices."""
    a = jnp.sqrt(jnp.maximum(M[..., 0, 0], 1e-30))
    b = M[..., 1, 0] / a
    c = M[..., 2, 0] / a
    d = jnp.sqrt(jnp.maximum(M[..., 1, 1] - b * b, 1e-30))
    e = (M[..., 2, 1] - c * b) / d
    f = jnp.sqrt(jnp.maximum(M[..., 2, 2] - c * c - e * e, 1e-30))
    z = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([a, z, z], -1),
            jnp.stack([b, d, z], -1),
            jnp.stack([c, e, f], -1),
        ],
        -2,
    )


def pm_coupling_table(Wr_rows, Wd_rows, bs: BlockSchurTables):
    """Gather the coupling rows into the point-major (P*Tu, 18) layout.
    Shared by the block build, the reduced rhs and the back-substitution
    so the W tables have exactly ONE consumer access pattern (layout
    conflicts between row-gather and (·,6,3)-reshape consumers were
    measured to 2.5x the whole iteration)."""
    Wall = jnp.concatenate([Wr_rows, Wd_rows], axis=0)  # (No+Nd, 18)
    V = Wall[bs.uni_slots.reshape(-1)] * bs.uni_mask.reshape(-1, 1)
    # barrier: without it XLA fuses the gather pipeline into each
    # downstream consumer, recomputing it several times over
    return jax.lax.optimization_barrier(V)  # (P*Tu, 18)


def build_schur_blocks(V, Hpp_inv, bs: BlockSchurTables):
    """Form the U Hpp⁻¹ Uᵀ blocks G (B,6,6) of the explicit S from the
    point-major coupling table V = pm_coupling_table(...).

    Lane-layout discipline (PERF.md): V stays in (rows, 18) form; the
    pair contraction is ONE batched MXU dot_general per chunk with both
    the K and 3 axes contracting, producing (B,6,6) directly.
    """
    P, Tu = bs.uni_slots.shape
    # Right-multiply each 6x3 row-block by L = chol(Hpp_inv):
    # out[:, 3i+k] = sum_j V[:, 3i+j] L[p,j,k]
    L = _chol3x3(Hpp_inv)  # (P,3,3)
    Vp = V.reshape(P, Tu * 6, 3)
    V2 = jax.lax.dot_general(
        Vp, L, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=V.dtype,
    )  # (P, Tu*6, 3)
    V2 = jax.lax.optimization_barrier(V2.reshape(P * Tu, 18))
    # TPU gathers move ~4.5 GB/s: gather the pair rows in bf16 (the S
    # blocks feed an inexact-Newton CG whose steps are LM accept-gated,
    # so half-precision coupling blocks cost accuracy the solver is
    # already robust to; products accumulate in f32 on the MXU).
    V2h = V2.astype(jnp.bfloat16)
    outs = []
    for ca_t, cb_t, cm_t in zip(bs.con_a, bs.con_b, bs.con_mask):
        Bb, Kb = ca_t.shape
        # chunk each bucket's gather to ~1M rows
        chunk_b = max(1, min(Bb, 1_000_000 // max(Kb, 1)))
        for b0 in range(0, Bb, chunk_b):
            b1 = min(b0 + chunk_b, Bb)
            ca = ca_t[b0:b1].reshape(-1)
            cb = cb_t[b0:b1].reshape(-1)
            A = (V2h[ca].reshape(b1 - b0, Kb, 18)
                 * cm_t[b0:b1, :, None].astype(jnp.bfloat16)).reshape(b1 - b0, Kb, 6, 3)
            Bv = V2h[cb].reshape(b1 - b0, Kb, 6, 3)
            # G[b,i,j] = sum_{k,l} A[b,k,i,l] Bv[b,k,j,l] — ONE dot_general
            # with both (K, 3) axes contracting; producing (B,6,6) directly
            # keeps the 18x18 outer-product sums out of HBM
            outs.append(
                jax.lax.dot_general(
                    A, Bv, dimension_numbers=(((1, 3), (1, 3)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            )
    G = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]  # (B,6,6)
    return G


def _sel_i6(dtype):
    """(18,6) selector: Sel[3i+l, i'] = δ_{i,i'} (sum over the l triple)."""
    s = np.zeros((18, 6), np.float32)
    s[np.arange(18), np.arange(18) // 3] = 1.0
    return jnp.asarray(s, dtype)


def _sel_l3(dtype):
    """(18,3) selector: Sel[3i+l, l'] = δ_{l,l'} (sum over the i groups)."""
    s = np.zeros((18, 3), np.float32)
    s[np.arange(18), np.arange(18) % 3] = 1.0
    return jnp.asarray(s, dtype)


def pm_reduced_rhs(V, Hpp_inv, g_c, g_p, bs: BlockSchurTables):
    """rhs = −(g_c − U Hpp⁻¹ g_p) computed in the pm layout.
    Returns (rhs (C,6), hp (P,3)).

    Lane discipline: V is only ever touched as (rows, 18); the 6x3 block
    structure is expressed through constant (18,·) selector matmuls —
    (·,6,3) reshapes here were measured to conflict with the block
    build's layout and 2.5x the fused iteration.
    """
    P, Tu = bs.uni_slots.shape
    hp = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)  # (P,3)
    hp18 = hp @ _sel_l3(V.dtype).T  # (P,18): hp18[:, 3i+l] = hp[:, l]
    prod = V.reshape(P, Tu, 18) * hp18[:, None, :]
    r6 = prod.reshape(P * Tu, 18) @ _sel_i6(V.dtype)  # (P*Tu, 6)
    red = (r6[bs.cam_slots.reshape(-1)].reshape(*bs.cam_slots.shape, 6)
           * bs.cam_mask[..., None]).sum(1)  # (C,6)
    return -(g_c - red), hp


def pm_backsub(V, Hpp_inv, g_p, delta_c, point_var, bs: BlockSchurTables):
    """Δp = −Hpp⁻¹ (g_p + Uᵀ Δc) in the pm layout (padded rows of V are
    zero, so the clamped pm_cam gather contributes nothing)."""
    P, Tu = bs.uni_slots.shape
    xg = delta_c[bs.pm_cam]  # (P*Tu, 6)
    xg18 = xg @ _sel_i6(V.dtype).T  # (P*Tu,18): xg18[:, 3i+l] = xg[:, i]
    prod = V * xg18
    wtd_rows = prod @ _sel_l3(V.dtype)  # (P*Tu, 3)
    wtd = wtd_rows.reshape(P, Tu, 3).sum(1)  # (P,3)
    return -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + wtd) * point_var[:, None]


def block_schur_matvec(G, bs: BlockSchurTables, Hcc_aug, x):
    """S x with S = Hcc_aug − G (symmetric block structure)."""
    yb = jnp.einsum("bij,bj->bi", G, x[bs.blk_cols])  # (B,6)
    ybT = jnp.einsum("bij,bi->bj", G, x[bs.blk_rows])  # transpose side
    yr = (yb[bs.row_slots] * bs.row_mask[..., None]).sum(1)  # (C,6)
    yc = (ybT[bs.colT_slots] * bs.colT_mask[..., None]).sum(1)
    return jnp.einsum("cij,cj->ci", Hcc_aug, x) - yr - yc


def schur_cg_blocks(G, bs: BlockSchurTables, Hcc_aug, rhs, cg_iters: int, cg_tol, x0=None):
    """PCG on the explicit block-sparse S. Preconditioner = exact block
    Jacobi of S (Hcc_aug − diag blocks of G) — strictly better than the
    Hcc_aug-only preconditioner of the matrix-free path."""
    Sdiag = Hcc_aug - G[bs.diag_ids] * bs.diag_mask[:, None, None]
    Minv = jnp.linalg.inv(Sdiag)

    def S_mv(x):
        return block_schur_matvec(G, bs, Hcc_aug, x)

    def prec(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    x0 = jnp.zeros_like(rhs) if x0 is None else x0
    r0 = rhs - S_mv(x0)
    z0 = prec(r0)
    rz0 = (r0 * z0).sum()
    rhs_norm = jnp.sqrt((rhs * rhs).sum()) + 1e-30

    def body(state):
        x, r, p, rz, it = state
        Sp = S_mv(p)
        denom = (p * Sp).sum()
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Sp
        z = prec(r)
        rz_new = (r * z).sum()
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    def cond(state):
        _x, r, _p, _rz, it = state
        return (it < cg_iters) & (jnp.sqrt((r * r).sum()) > cg_tol * rhs_norm)

    x, _r, _p, _rz, it = jax.lax.while_loop(cond, body, (x0, r0, z0, rz0, 0))
    return x, it
