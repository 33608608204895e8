"""Two-frame RGB-D alignment debug tool: match features, lift with
measured depth, estimate the rigid transform, report residuals.

Generalized equivalent of the fork's icp/main.py (reference
icp/main.py:1-193: brute-force descriptor matching, depth lifting, and a
hand-rolled alignment/interpolation check) — here with the framework's
batched matcher, RANSAC-robust Umeyama/Kabsch estimation, and an
optional point-to-point ICP refinement on the full clouds.

Usage:
  python scripts/icp_align.py --data_dir scene/ --img1 im00.png --img2 im01.png \
      [--viz matches.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def umeyama(src, dst):
    """Rigid (R, t) minimizing ||R src + t - dst||."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    S = (dst - mu_d).T @ (src - mu_s) / len(src)
    U, _, Vt = np.linalg.svd(S)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    return R, mu_d - R @ mu_s


def icp_refine(src, dst, R, t, iters=10, trim=0.8):
    """Point-to-point ICP with trimmed NN correspondences."""
    import scipy.spatial

    tree = scipy.spatial.cKDTree(dst)
    for _ in range(iters):
        moved = src @ R.T + t
        d, j = tree.query(moved, k=1)
        k = max(int(len(d) * trim), 10)
        keep = np.argsort(d)[:k]
        R, t = umeyama(src[keep], dst[j[keep]])
    return R, t


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--img1", required=True)
    ap.add_argument("--img2", required=True)
    ap.add_argument("--viz", default=None)
    ap.add_argument("--ransac_thresh", type=float, default=0.05)
    ap.add_argument("--icp", action="store_true", help="refine with full-cloud ICP")
    args = ap.parse_args()

    from mpsfm_tpu.datasets.simple import SimpleParser
    from mpsfm_tpu.extraction.features.classical import ClassicalFeatures
    from mpsfm_tpu.extraction.matchers.nn import MutualNNMatcher
    from mpsfm_tpu.utils.io import read_image

    parser = SimpleParser(args.data_dir)
    model = ClassicalFeatures({})
    feats, grays, depths, Ks = {}, {}, {}, {}
    for name in (args.img1, args.img2):
        g = read_image(parser.image_path(name), grayscale=True).astype(np.float32) / 255.0
        grays[name] = g
        feats[name] = model(g)
        kw = parser.prior_inputs(name)
        depths[name] = kw["depth_measured"]
        Ks[name] = kw["intrinsics"]

    m = MutualNNMatcher({})
    out = m(feats[args.img1]["descriptors"], feats[args.img2]["descriptors"])
    matches0 = np.asarray(out["matches0"])
    valid = matches0 >= 0
    k1 = feats[args.img1]["keypoints"][valid]
    k2 = feats[args.img2]["keypoints"][matches0[valid]]
    print(f"matches: {valid.sum()}")

    def lift(name, kps):
        fx, fy, cx, cy = Ks[name]
        d = depths[name]
        xi = np.clip(np.round(kps[:, 0]).astype(int), 0, d.shape[1] - 1)
        yi = np.clip(np.round(kps[:, 1]).astype(int), 0, d.shape[0] - 1)
        z = d[yi, xi]
        ok = z > 0
        X = np.stack([(kps[:, 0] - cx) / fx * z, (kps[:, 1] - cy) / fy * z, z], -1)
        return X, ok

    X1, ok1 = lift(args.img1, k1)
    X2, ok2 = lift(args.img2, k2)
    ok = ok1 & ok2
    X1, X2 = X1[ok], X2[ok]
    print(f"lifted 3D pairs: {ok.sum()}")

    # RANSAC Umeyama (3-point hypotheses)
    rng = np.random.default_rng(0)
    best, best_inl = None, -1
    for _ in range(512):
        idx = rng.choice(len(X1), 3, replace=False)
        try:
            R, t = umeyama(X1[idx], X2[idx])
        except np.linalg.LinAlgError:
            continue
        res = np.linalg.norm(X1 @ R.T + t - X2, axis=1)
        inl = int((res < args.ransac_thresh).sum())
        if inl > best_inl:
            best_inl, best = inl, (R, t, res < args.ransac_thresh)
    R, t, inliers = best
    R, t = umeyama(X1[inliers], X2[inliers])
    res = np.linalg.norm(X1 @ R.T + t - X2, axis=1)
    print(f"RANSAC inliers: {best_inl}/{len(X1)}; median residual {np.median(res[inliers]):.4f} m")

    if args.icp:
        def cloud(name):
            fx, fy, cx, cy = Ks[name]
            d = depths[name]
            ys, xs = np.mgrid[0 : d.shape[0] : 4, 0 : d.shape[1] : 4]
            z = d[ys, xs].reshape(-1)
            keep = z > 0
            return np.stack(
                [(xs.reshape(-1) - cx) / fx * z, (ys.reshape(-1) - cy) / fy * z, z], -1
            )[keep]

        R, t = icp_refine(cloud(args.img1), cloud(args.img2), R, t)
        res = np.linalg.norm(X1 @ R.T + t - X2, axis=1)
        print(f"after ICP: median residual {np.median(res[inliers]):.4f} m")

    print("R=\n", np.round(R, 4), "\nt=", np.round(t, 4))

    if args.viz:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        g1, g2 = grays[args.img1], grays[args.img2]
        H = max(g1.shape[0], g2.shape[0])
        comb = np.zeros((H, g1.shape[1] + g2.shape[1]))
        comb[: g1.shape[0], : g1.shape[1]] = g1
        comb[: g2.shape[0], g1.shape[1] :] = g2
        fig, ax = plt.subplots(figsize=(12, 6))
        ax.imshow(comb, cmap="gray")
        k1o, k2o = k1[ok][inliers], k2[ok][inliers]
        for a, b in zip(k1o, k2o):
            ax.plot([a[0], b[0] + g1.shape[1]], [a[1], b[1]], "r-", linewidth=0.4)
        ax.axis("off")
        fig.savefig(args.viz, bbox_inches="tight", pad_inches=0, dpi=150)
        print(f"saved {args.viz}")


if __name__ == "__main__":
    main()
