"""Coarse-to-fine NCC dense matcher (JAX) — the no-weights stand-in for
the reference's dense matchers (RoMa warp / MASt3R reciprocal matching,
mpsfm/extraction/pairwise/match_dense_2view.py + models/roma.py).

Estimates a stride-s flow field A->B by normalized cross-correlation:
global search on a coarse pyramid level, windowed refinement per finer
level, forward-backward consistency for certainty. Outputs grid
keypoints + matches + certainties in the same shape the dense cache
plumbing expects (dfeats/dmatches streams). The learned matchers drop
into the same interface once checkpoints are available.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pyr_down(img):
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    img = jax.lax.conv_general_dilated(
        img[None, :, :, None], (k[:, None] * k[None, :])[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    return img[::2, ::2]


def _patches_at(img, ys, xs, P):
    offs = jnp.arange(-(P // 2), P // 2 + 1)
    H, W = img.shape
    py = jnp.clip(ys[:, None, None] + offs[None, :, None], 0, H - 1)
    px = jnp.clip(xs[:, None, None] + offs[None, None, :], 0, W - 1)
    p = img[py, px].reshape(len(ys), -1)
    p = p - p.mean(-1, keepdims=True)
    return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-6)


def _refine_level(imgA, imgB, ys, xs, flow, P: int, R: int):
    """At one level: for A grid points (ys,xs) with current flow, search a
    (2R+1)^2 window in B for the best NCC match. Returns (flow, score)."""
    H, W = imgB.shape
    pa = _patches_at(imgA, ys, xs, P)  # (N, P*P)
    offs = jnp.arange(-R, R + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    cand_y = jnp.clip(ys[:, None] + flow[:, 1, None] + dy.reshape(-1)[None, :], 0, H - 1)
    cand_x = jnp.clip(xs[:, None] + flow[:, 0, None] + dx.reshape(-1)[None, :], 0, W - 1)
    N, K = cand_y.shape
    pb = _patches_at(imgB, cand_y.reshape(-1), cand_x.reshape(-1), P).reshape(N, K, -1)
    ncc = jnp.einsum("np,nkp->nk", pa, pb)
    best = jnp.argmax(ncc, axis=1)
    score = jnp.max(ncc, axis=1)
    ar = jnp.arange(N)
    new_flow = jnp.stack([cand_x[ar, best] - xs, cand_y[ar, best] - ys], -1)
    return new_flow, score


@partial(jax.jit, static_argnames=("stride", "patch", "levels", "coarse_radius", "fine_radius"))
def ncc_flow(imgA, imgB, stride: int = 8, patch: int = 7, levels: int = 3,
             coarse_radius: int = 16, fine_radius: int = 3):
    """Returns (grid_xy (N,2) in A, flow (N,2) A->B, certainty (N,))."""
    H, W = imgA.shape
    pyrA = [imgA]
    pyrB = [imgB]
    for _ in range(levels - 1):
        pyrA.append(_pyr_down(pyrA[-1]))
        pyrB.append(_pyr_down(pyrB[-1]))

    ys0, xs0 = jnp.meshgrid(
        jnp.arange(patch, H - patch, stride), jnp.arange(patch, W - patch, stride), indexing="ij"
    )
    ys0 = ys0.reshape(-1)
    xs0 = xs0.reshape(-1)

    # coarse level: global-ish search
    f = 2 ** (levels - 1)
    ys = ys0 // f
    xs = xs0 // f
    flow = jnp.zeros((len(ys0), 2), jnp.int32)
    flow, score = _refine_level(pyrA[-1], pyrB[-1], ys, xs, flow, patch, coarse_radius)
    # finer levels
    for lvl in range(levels - 2, -1, -1):
        f = 2**lvl
        flow = flow * 2
        ys = ys0 // f
        xs = xs0 // f
        flow, score = _refine_level(pyrA[lvl], pyrB[lvl], ys, xs, flow, patch, fine_radius)

    # forward-backward check at full res
    bx = jnp.clip(xs0 + flow[:, 0], 0, W - 1)
    by = jnp.clip(ys0 + flow[:, 1], 0, H - 1)
    back, _ = _refine_level(imgB, imgA, by, bx, -flow, patch, fine_radius)
    fb_err = jnp.linalg.norm((back + flow).astype(jnp.float32), axis=-1)
    certainty = score * jnp.exp(-0.5 * (fb_err / 2.0) ** 2)
    grid_xy = jnp.stack([xs0, ys0], -1).astype(jnp.float32)
    return grid_xy, flow.astype(jnp.float32), certainty


def assign_flow_to_keypoints(grid_xy, flow, certainty, kpsA, kpsB, max_dist=2.0, cert_thresh=0.5):
    """RoMa-sparse-style anchoring (reference models/utils/warp.py:34-73):
    interpolate the dense flow at detected keypoints of A, warp them into
    B, and assign each to the nearest detected keypoint of B within
    max_dist px (greedy dedup by certainty). Returns matches0 (NA,) into
    kpsB (or -1) + scores."""
    import scipy.spatial

    NA = len(kpsA)
    matches0 = np.full(NA, -1, np.int64)
    scores0 = np.zeros(NA, np.float32)
    if NA == 0 or len(kpsB) == 0 or len(grid_xy) == 0:
        return {"matches0": matches0, "matching_scores0": scores0}
    # interpolate flow + certainty at kpsA from the (scattered) grid
    tree_g = scipy.spatial.cKDTree(grid_xy)
    dist, idx = tree_g.query(kpsA, k=1)
    ux = np.unique(grid_xy[:, 0])
    stride = float(np.median(np.diff(ux))) if len(ux) > 1 else 8.0
    ok = (dist < 1.5 * max(stride, 8.0)) & (certainty[idx] > cert_thresh)
    warped = kpsA + flow[idx]
    tree_b = scipy.spatial.cKDTree(kpsB)
    db, jb = tree_b.query(warped, k=1)
    ok &= db < max_dist
    # greedy dedup: highest certainty keeps the target
    order = np.argsort(-certainty[idx])
    taken = set()
    for i in order:
        if not ok[i]:
            continue
        j = int(jb[i])
        if j in taken:
            continue
        taken.add(j)
        matches0[i] = j
        scores0[i] = certainty[idx[i]]
    return {"matches0": matches0, "matching_scores0": scores0}


class DenseNCCMatcher:
    """Dense matcher interface: pair of grayscale images -> dense
    keypoints in both + matches + certainties (reference 'dense' mode)."""

    default_conf = {
        "stride": 8,
        "patch": 7,
        "levels": 3,
        "certainty_threshold": 0.55,
        "max_matches": 4096,
    }

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}

    def __call__(self, grayA: np.ndarray, grayB: np.ndarray):
        c = self.conf
        # pad both to a common bucket so jit caches hit
        H = max(grayA.shape[0], grayB.shape[0])
        W = max(grayA.shape[1], grayB.shape[1])
        Hb = ((H + 31) // 32) * 32
        Wb = ((W + 31) // 32) * 32
        A = np.zeros((Hb, Wb), np.float32)
        B = np.zeros((Hb, Wb), np.float32)
        A[: grayA.shape[0], : grayA.shape[1]] = grayA
        B[: grayB.shape[0], : grayB.shape[1]] = grayB
        grid, flow, cert = jax.tree.map(
            np.asarray,
            ncc_flow(jnp.asarray(A), jnp.asarray(B), c["stride"], c["patch"], c["levels"]),
        )
        tgt = grid + flow
        ok = (
            (cert > c["certainty_threshold"])
            & (grid[:, 0] < grayA.shape[1])
            & (grid[:, 1] < grayA.shape[0])
            & (tgt[:, 0] >= 0)
            & (tgt[:, 0] < grayB.shape[1])
            & (tgt[:, 1] >= 0)
            & (tgt[:, 1] < grayB.shape[0])
        )
        idx = np.where(ok)[0]
        if len(idx) > c["max_matches"]:
            idx = idx[np.argsort(cert[idx])[::-1][: c["max_matches"]]]
        return {
            "keypoints0": grid[idx],
            "keypoints1": tgt[idx],
            "certainty": cert[idx],
        }
