"""CLI driver (reference parity: reconstruct.py --conf --data_dir ...)."""

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description="TPU-native MP-SfM reconstruction")
    ap.add_argument("--conf", default=None, help="config name under configs/ or a yaml path")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--images_dir", default=None)
    ap.add_argument("--intrinsics_path", default=None)
    ap.add_argument("--cache_dir", default=None)
    ap.add_argument("--sfm_outputs_dir", default=None)
    ap.add_argument(
        "--extract",
        nargs="*",
        default=[],
        help="artifact classes to force re-extraction: f(eatures) m(atches) d(epth) p(airs)",
    )
    ap.add_argument("--verbose", type=int, default=0)
    ap.add_argument(
        "--refrec_dir",
        default=None,
        help="COLMAP-format reference reconstruction; prints ATE after mapping",
    )
    args = ap.parse_args()

    conf = {}
    if args.conf:
        from mpsfm_tpu.config import load_cfg

        path = Path(args.conf)
        if not path.exists():
            path = Path(__file__).parent / "configs" / f"{args.conf}.yaml"
        conf = load_cfg(path)

    from mpsfm_tpu.pipeline import reconstruct

    rec, ok = reconstruct(
        args.data_dir,
        conf=conf,
        images_dir=args.images_dir,
        intrinsics_path=args.intrinsics_path,
        cache_dir=args.cache_dir,
        sfm_outputs_dir=args.sfm_outputs_dir,
        extract=args.extract,
        verbose=args.verbose,
    )
    print(f"success={ok} registered={rec.num_reg_images()}/{rec.num_images()} points={rec.num_points3D()}")
    if args.refrec_dir:
        import json

        from mpsfm_tpu.eval import ate_between
        from mpsfm_tpu.utils.colmap_io import read_text

        try:
            metrics = ate_between(rec, read_text(args.refrec_dir))
            metrics.pop("per_image", None)
            print("ATE vs reference:", json.dumps(metrics))
        except (OSError, ValueError, IndexError) as e:
            print(f"ATE evaluation failed ({args.refrec_dir}): {e}")


if __name__ == "__main__":
    main()
