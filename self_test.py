"""Smoke test (reference parity: self_test.py): render a small synthetic
RGB-D scene, run the full pipeline, report registration + ATE, write the
3d.html viewer. No pretrained weights or external data needed."""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent / "tests"))


def main():
    import numpy as np

    from synthetic import PlaneScene, render_scene_dir, umeyama_alignment
    from mpsfm_tpu.config import load_cfg
    from mpsfm_tpu.pipeline import reconstruct

    tmp = Path(tempfile.mkdtemp(prefix="mpsfm_selftest_"))
    rng = np.random.default_rng(0)
    scene = PlaneScene(rng=rng, n_images=5, n_points=0, img_wh=(320, 240), focal=260.0, baseline=0.3)
    data_dir = render_scene_dir(scene, tmp / "scene", rng=rng, depth_noise=0.01)
    print(f"Rendered scene at {data_dir}")

    conf = load_cfg(Path(__file__).parent / "configs" / "classical-nn_measured.yaml")
    rec, ok = reconstruct(data_dir, conf=conf, verbose=1)

    est, gt = [], []
    for imid in rec.reg_image_ids():
        est.append(rec.images[imid].pose.center())
        gt.append(scene.poses[int(rec.images[imid].name[2:4])].center())
    est, gt = np.stack(est), np.stack(gt)
    s, R, t = umeyama_alignment(est, gt)
    ate = float(np.sqrt((((s * (R @ est.T)).T + t - gt) ** 2).sum(-1).mean()))

    print(
        f"self test: success={ok} registered={rec.num_reg_images()}/{rec.num_images()} "
        f"points={rec.num_points3D()} ATE={ate:.4f}"
    )
    assert ok and rec.num_reg_images() >= 4 and ate < 0.1, "SELF TEST FAILED"
    print("SELF TEST PASSED")


if __name__ == "__main__":
    main()
