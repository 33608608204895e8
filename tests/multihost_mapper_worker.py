"""Worker process for the 2-process MAPPER dryrun (VERDICT r4 item 7).

Each of the 2 processes owns 4 virtual CPU devices; the full incremental
mapper runs REPLICATED on both ranks (same scene, same seeds) while every
distributed global BA executes as one program over the global 8-device
mesh with real cross-process Gloo collectives. This proves the design
claim in parallel/multihost.py: host control is replicated-deterministic
— both ranks must make IDENTICAL registration decisions with zero
control-plane messaging.

Writes a JSON verdict (registration order, point counts, final poses)
the parent test diffs across ranks.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mpsfm_tpu.parallel.multihost import initialize_multihost

    assert initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    import mpsfm_tpu  # noqa: F401

    jax.config.update("jax_compilation_cache_dir", None)

    import numpy as np
    from synthetic import PlaneScene

    from mpsfm_tpu.mapper import MpsfmMapper
    from mpsfm_tpu.scene.correspondences import Correspondences

    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    scene = PlaneScene(rng=np.random.default_rng(3), n_images=5, n_points=120)
    rec, keypoints, matches, gt = scene.build()
    corr = Correspondences({"num_hyp": 64}, rec)
    corr.populate(keypoints, matches)
    mapper = MpsfmMapper(
        {
            "verbose": 0,
            "ba": {"max_iters": 6, "dist_ba": "on", "dist_ba_shards": jax.device_count()},
            "registration": {"num_hyp": 64},
        },
        rec,
        corr,
    )
    rec, ok = mapper()

    reg_ids = sorted(int(i) for i, im in rec.images.items() if im.registered)
    verdict = {
        "pid": pid,
        "ok": bool(ok),
        "registered": reg_ids,
        "dist_solves": int(mapper.optimizer.dist_solves),
        "points_per_image": {
            int(i): int(rec.images[i].num_points3D()) for i in reg_ids
        },
        "num_points3D": int(rec.num_points3D()),
        "poses": {
            int(i): np.concatenate(
                [rec.images[i].pose.q, rec.images[i].pose.t]
            ).tolist()
            for i in reg_ids
        },
    }
    with open(os.path.join(outdir, f"mapper_verdict_{pid}.json"), "w") as f:
        json.dump(verdict, f)
    print("OK", pid, verdict["registered"], verdict["dist_solves"])


if __name__ == "__main__":
    main()
