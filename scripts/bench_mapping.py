"""Mapping throughput: registered frames/s through the full pipeline.

BASELINE.md target row "Mapping throughput | registered frames/s per
chip". Renders a synthetic RGB-D scene once, then times the mapping
stage (extraction cached) end to end on the default backend.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(n_images=12):
    import numpy as np

    from synthetic import PlaneScene, render_scene_dir

    scene = PlaneScene(
        rng=np.random.default_rng(2), n_images=n_images, img_wh=(320, 240), focal=260.0, baseline=0.18
    )
    data_dir = "/tmp/bench_mapping_scene"
    import shutil

    shutil.rmtree(data_dir, ignore_errors=True)
    render_scene_dir(scene, data_dir, rng=np.random.default_rng(2), depth_noise=0.01)

    from mpsfm_tpu.config import load_cfg
    from mpsfm_tpu.pipeline import reconstruct

    conf = load_cfg("configs/classical-nn_measured.yaml").to_dict()
    # warm pass: extraction + compile cache
    rec, ok = reconstruct(data_dir, conf=conf, sfm_outputs_dir=data_dir + "/out0")
    assert ok, "warm pass failed"
    from mpsfm_tpu.utils.profiling import TIMERS as _T

    _T.reset()
    t0 = time.time()
    rec, ok = reconstruct(data_dir, conf=conf, sfm_outputs_dir=data_dir + "/out1")
    dt = time.time() - t0
    n = rec.num_reg_images()
    print(
        f"mapping: {n}/{n_images} registered in {dt:.1f}s -> {n/dt:.2f} frames/s "
        f"({rec.num_points3D()} points)"
    )
    from mpsfm_tpu.utils.profiling import TIMERS

    print(TIMERS.summary())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
