"""Console entry point (mirrors repo-root reconstruct.py)."""


def main():
    import importlib.util
    import pathlib
    import sys

    root = pathlib.Path(__file__).parent.parent
    spec = importlib.util.spec_from_file_location("_reconstruct", root / "reconstruct.py")
    if spec is None or spec.loader is None:  # installed without repo root
        from mpsfm_tpu.pipeline import reconstruct  # noqa: F401

        raise SystemExit("use `python reconstruct.py` from the repository root")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


if __name__ == "__main__":
    main()
