"""Inspect extraction HDF5 caches: tree, stats, keypoint overlays.

Generalized equivalent of the fork's examine_hdf5.py (reference
examine_hdf5.py:1-92).

Usage:
  python scripts/examine_cache.py cache/feats-classical.h5            # tree
  python scripts/examine_cache.py cache/feats-classical.h5 --key im01.png
  python scripts/examine_cache.py cache/feats-classical.h5 \
      --key im01.png --images_dir scene/images --plot out.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import h5py
import numpy as np


def tree(h5obj, prefix=""):
    for key, item in h5obj.items():
        if isinstance(item, h5py.Group):
            print(f"{prefix}{key}/")
            tree(item, prefix + "  ")
        else:
            a = item[()]
            extra = ""
            if np.issubdtype(np.asarray(a).dtype, np.number) and np.size(a) > 0:
                extra = f"  min={np.min(a):.4g} max={np.max(a):.4g}"
            print(f"{prefix}{key}: {getattr(a, 'shape', ())} {getattr(a, 'dtype', type(a))}{extra}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cache")
    ap.add_argument("--key", default=None, help="group to expand (e.g. an image name)")
    ap.add_argument("--images_dir", default=None)
    ap.add_argument("--plot", default=None, help="save a keypoint overlay PNG")
    args = ap.parse_args()

    with h5py.File(args.cache, "r") as f:
        if args.key is None:
            tree(f)
            return
        g = f[args.key]
        tree(g if isinstance(g, h5py.Group) else {args.key: g})
        if args.plot and args.images_dir and isinstance(g, h5py.Group) and "keypoints" in g:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from mpsfm_tpu.utils.io import read_image

            img = read_image(f"{args.images_dir}/{args.key}")
            kps = g["keypoints"][()]
            fig, ax = plt.subplots()
            ax.imshow(img)
            ax.plot(kps[:, 0], kps[:, 1], "bx", markersize=2)
            ax.axis("off")
            fig.savefig(args.plot, bbox_inches="tight", pad_inches=0, dpi=150)
            print(f"saved {args.plot} ({len(kps)} keypoints)")


if __name__ == "__main__":
    main()
