"""Batch evaluation driver over benchmark scene sets (ETH3D layout).

Runs the pipeline per scene directory and aggregates ATE vs reference
reconstructions — the harness the reference's paper numbers come from
(scene lists in mpsfm_tpu/vars.py; the datasets themselves are not
shipped in this image, so this activates when data is mounted).

Layout expected per scene:
  <root>/<scene>/images/          RGB images
  <root>/<scene>/intrinsics.yaml  PINHOLE intrinsics
  <root>/<scene>/depth/           (optional) sensor depth for measured mode
  <root>/<scene>/refrec/          (optional) COLMAP-format reference rec
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--scenes", nargs="*", default=None, help="default: all subdirs")
    ap.add_argument("--conf", default="classical-nn_measured")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mpsfm_tpu.config import load_cfg
    from mpsfm_tpu.eval import ate_between
    from mpsfm_tpu.pipeline import reconstruct
    from mpsfm_tpu.utils.colmap_io import read_text

    root = Path(args.root)
    scenes = args.scenes or [p.name for p in root.iterdir() if (p / "images").is_dir()]
    conf_path = Path(args.conf)
    if not conf_path.exists():
        conf_path = Path(__file__).parent.parent / "configs" / f"{args.conf}.yaml"
    conf = load_cfg(conf_path)

    results = {}
    for scene in scenes:
        sdir = root / scene
        print(f"=== {scene} ===")
        try:
            rec, ok = reconstruct(sdir, conf=conf)
            entry = {
                "success": ok,
                "registered": rec.num_reg_images(),
                "total": rec.num_images(),
                "points": rec.num_points3D(),
            }
            ref_dir = sdir / "refrec"
            if ref_dir.exists():
                metrics = ate_between(rec, read_text(ref_dir))
                metrics.pop("per_image", None)
                entry["ate"] = metrics
            results[scene] = entry
        except Exception as e:  # keep the sweep alive across scene failures
            results[scene] = {"success": False, "error": str(e)}
        print(json.dumps(results[scene]))

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    reg = [r for r in results.values() if r.get("success")]
    print(
        f"\n{len(reg)}/{len(results)} scenes succeeded; "
        f"mean registration rate "
        f"{sum(r['registered'] / max(r['total'], 1) for r in reg) / max(len(reg), 1):.2f}"
    )


if __name__ == "__main__":
    main()
