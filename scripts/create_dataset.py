"""Dataset prep: subsample an RGB-D capture into the framework's scene
layout (images/ + depth/ + intrinsics.yaml).

Generalized equivalent of the fork's custom_dataset/create_dataset.py
(reference custom_dataset/create_dataset.py:1-37, which hardcodes paths
and a 200:500:50 frame range).

Usage:
  python scripts/create_dataset.py --rgb_dir X/rgb --depth_dir X/depth \
      --out scene/ --fx 306.9 --fy 306.9 --cx 318.6 --cy 198.4 \
      [--start 0 --stop -1 --step 1] [--depth_scale 1000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import shutil
from pathlib import Path

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rgb_dir", required=True)
    ap.add_argument("--depth_dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fx", type=float, required=True)
    ap.add_argument("--fy", type=float, required=True)
    ap.add_argument("--cx", type=float, required=True)
    ap.add_argument("--cy", type=float, required=True)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--stop", type=int, default=-1)
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--depth_scale", type=float, default=1000.0,
                    help="divide integer depth PNGs by this to get meters")
    args = ap.parse_args()

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rgb_files = sorted(Path(args.rgb_dir).iterdir())
    stop = len(rgb_files) if args.stop < 0 else args.stop
    picked = rgb_files[args.start : stop : args.step]
    if args.depth_dir:
        (out / "depth").mkdir(exist_ok=True)

    for p in picked:
        shutil.copy(p, out / "images" / p.name)
        if args.depth_dir:
            dsrc = Path(args.depth_dir) / p.name
            for cand in (dsrc, dsrc.with_suffix(".png"), dsrc.with_suffix(".npy")):
                if cand.exists():
                    dsrc = cand
                    break
            else:
                raise FileNotFoundError(f"no depth for {p.name} in {args.depth_dir}")
            if dsrc.suffix == ".npy":
                np.save(out / "depth" / (p.stem + ".npy"), np.load(dsrc))
            else:
                import cv2

                d = cv2.imread(str(dsrc), cv2.IMREAD_UNCHANGED).astype(np.float64)
                np.save(out / "depth" / (p.stem + ".npy"), d / args.depth_scale)

    intr = {1: {"params": [args.fx, args.fy, args.cx, args.cy], "images": "all"}}
    (out / "intrinsics.yaml").write_text(yaml.safe_dump(intr))
    print(f"wrote {len(picked)} frames to {out} (+intrinsics.yaml)")


if __name__ == "__main__":
    main()
