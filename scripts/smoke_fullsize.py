"""Full-size network smoke on the real TPU chip (VERDICT r3 item 4).

Instantiates every external-net port at its PRODUCTION configuration with
random weights and runs one forward through the extraction-path API on
the attached TPU — proving compile, VMEM/HBM fit, and measuring compile +
steady-state time per net. (Checkpoint weights are absent in the
zero-egress image; random weights exercise identical compute/memory.)

Usage:
    python scripts/smoke_fullsize.py <component>   # one net, prints JSON
    python scripts/smoke_fullsize.py --all         # each in a subprocess,
                                                   # appends to SMOKE_FULLSIZE.jsonl

Reference sizes: /root/reference/mpsfm/extraction/imagewise/geometry/
models/configs/*.yaml (metric3dv2 {small,large,giant2}, depthpro, dav2),
matchers/models/configs (mast3r 512, roma 672), superpoint 1600/6000kps,
lightglue 9 layers x 2048 kps.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    """Force a value transfer (block_until_ready does not block on the
    tunneled backend — PERF.md environment facts)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)
    return x


def _mem_mb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**20)
    except Exception:
        return None


def _img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    im = rng.uniform(0, 255, (h, w, c) if c else (h, w)).astype(np.float32)
    return im


def run_component(name):
    import jax  # noqa: F401  (select the default (TPU) platform)

    t_init = time.time()
    if name.startswith("metric3d"):
        from mpsfm_tpu.extraction.nets.metric3d import Metric3Dv2

        enc = {"metric3d-small": "vit_small_reg", "metric3d-large": "vit_large_reg",
               "metric3d-giant2": "vit_giant2_reg"}[name]
        net = Metric3Dv2({"encoder": enc})
        net.init_random(0)
        img = _img(768, 1024)
        call = lambda: net.infer_image(img, (1200.0, 1200.0, 512.0, 384.0))
    elif name == "depthpro":
        from mpsfm_tpu.extraction.nets.depth_pro import DepthPro

        net = DepthPro()
        net.init_random(0)
        img = _img(768, 1024)
        call = lambda: net.infer_image(img, f_px=1200.0)
    elif name == "depthanything":
        from mpsfm_tpu.extraction.nets.depth_anything import DepthAnythingV2

        net = DepthAnythingV2()  # vitl
        net.init_random(0)
        img = _img(768, 1024)
        call = lambda: net.infer_image(img)
    elif name == "dsine":
        from mpsfm_tpu.extraction.nets.dsine import DSINE

        net = DSINE({})
        net.init_random(0)
        img = _img(768, 1024)
        call = lambda: net.infer_image(img, (1200.0, 1200.0, 512.0, 384.0))
    elif name == "mast3r":
        from mpsfm_tpu.extraction.nets.mast3r import Mast3rMatcher

        net = Mast3rMatcher({"allow_random": True})
        net.net.init_random(0)
        a, b = _img(384, 512), _img(384, 512, seed=1)
        call = lambda: net(a, b)
    elif name == "roma":
        from mpsfm_tpu.extraction.nets.roma import RomaMatcher

        net = RomaMatcher({"allow_random": True})
        net.net.init_random(0)
        a, b = _img(672, 672), _img(672, 672, seed=1)
        call = lambda: net(a, b)
    elif name == "superpoint":
        from mpsfm_tpu.extraction.features.superpoint import SuperPoint

        net = SuperPoint({"max_keypoints": 6000})
        net.init_random(0)
        img = _img(1200, 1600, c=0) / 255.0
        call = lambda: net(img)
    elif name == "lightglue":
        from mpsfm_tpu.extraction.matchers.lightglue import LightGlue

        net = LightGlue({})
        net.init_random(0)
        rng = np.random.default_rng(0)
        n = 2048
        kps0 = rng.uniform(0, 1600, (n, 2)).astype(np.float32)
        kps1 = rng.uniform(0, 1600, (n, 2)).astype(np.float32)
        d0 = rng.normal(size=(n, 256)).astype(np.float32)
        d1 = rng.normal(size=(n, 256)).astype(np.float32)
        call = lambda: net(kps0, d0, (1600, 1200), kps1, d1, (1600, 1200))
    elif name == "netvlad":
        from mpsfm_tpu.extraction.retrieval import NetVLAD

        net = NetVLAD()
        net.init_random(0)
        img = _img(480, 640)
        call = lambda: net(img)
    else:
        raise SystemExit(f"unknown component {name}")
    t_build = time.time() - t_init

    t0 = time.time()
    out = call()
    _sync(out)
    t_first = time.time() - t0

    t0 = time.time()
    out = call()
    _sync(out)
    t_second = time.time() - t0

    import jax

    rec = {
        "component": name,
        "platform": jax.devices()[0].platform,
        "build_s": round(t_build, 2),
        "first_call_s": round(t_first, 2),
        "steady_s": round(t_second, 2),
        "peak_hbm_mb": _mem_mb(),
        "n_params_m": round(
            sum(int(np.prod(np.shape(v))) for v in jax.tree_util.tree_leaves(
                getattr(net, "params", None) or getattr(net.net, "params")
            )) / 1e6, 1,
        ),
    }
    print("SMOKE " + json.dumps(rec), flush=True)
    return rec


ALL = [
    "superpoint", "lightglue", "netvlad", "dsine", "depthanything",
    "metric3d-small", "metric3d-large", "mast3r", "roma", "depthpro",
    "metric3d-giant2",
]


def main():
    if len(sys.argv) > 1 and sys.argv[1] != "--all":
        run_component(sys.argv[1])
        return
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "SMOKE_FULLSIZE.jsonl")
    for comp in ALL:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), comp],
            capture_output=True, text=True, timeout=3600,
        )
        line = next((ln for ln in proc.stdout.splitlines() if ln.startswith("SMOKE ")), None)
        if line:
            rec = json.loads(line[6:])
        else:
            rec = {"component": comp, "error": (proc.stderr or proc.stdout)[-800:],
                   "wall_s": round(time.time() - t0, 1)}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
