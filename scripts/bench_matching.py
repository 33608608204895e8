"""Matching throughput: mutual-NN descriptor matching, pairs/s on one chip.

BASELINE.md target row "Matching throughput ... pairs/s per chip
(batched, no host round-trips)". Batches all pairs into ONE device
program: descriptors stacked (B, N, D), per-pair mutual-NN with ratio
test, one transfer back.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    B, N, D = 64, 2048, 256  # pairs per batch, kps per image, desc dim
    d0 = rng.normal(size=(B, N, D)).astype(np.float32)
    d1 = rng.normal(size=(B, N, D)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)

    @jax.jit
    def match_batch(a, b):
        sim = jnp.einsum("bnd,bmd->bnm", a, b)  # MXU
        j = jnp.argmax(sim, -1)
        i_back = jnp.argmax(sim, -2)
        ar = jnp.arange(a.shape[1])[None]
        mutual = jnp.take_along_axis(i_back, j, 1) == ar
        best = jnp.max(sim, -1)
        matches = jnp.where(mutual & (best > 0.0), j, -1)
        return matches, best

    a, b = jnp.asarray(d0), jnp.asarray(d1)
    m, s = match_batch(a, b)
    float(np.asarray(s).sum())
    t0 = time.time()
    runs = 5
    for _ in range(runs):
        m, s = match_batch(a, b)
        float(np.asarray(s).sum())
    dt = (time.time() - t0) / runs
    print(f"mutual-NN {N}x{N}x{D}: {B/dt:.0f} pairs/s  ({dt*1000/B:.2f} ms/pair, batch {B})")


def lightglue():
    """BASELINE.md row "LightGlue pairs/s per chip": the full 9-layer
    LightGlue attention matcher, batched pairs in one jitted program
    (throughput is weight-independent — random weights)."""
    from mpsfm_tpu.extraction.matchers.lightglue import LightGlue

    rng = np.random.default_rng(0)
    B, N, D = 16, 2048, 256
    lg = LightGlue({"dim": D, "num_heads": 4, "n_layers": 9})
    lg.init_random(0)
    k0 = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    k1 = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    d0 = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    d1 = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    m = jnp.ones((B, N), bool)

    # Production consumes the score matrix ON DEVICE (mutual-argmax match
    # extraction); transferring the raw (B,N,N) scores back would cost
    # ~270MB through the ~30MB/s tunnel and time the link, not the chip.
    # Time the forward + device-side match extraction, transfer O(B·N) —
    # through the PRODUCTION bf16 path (matcher default dtype; the f32
    # HIGHEST path is ~2.3x slower and only used by parity tests).
    @jax.jit
    def fwd_and_match(params, k0, k1, d0, d1, m0, m1):
        bf = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        with jax.default_matmul_precision("default"):
            scores = lg._forward(bf(params), bf(k0), bf(k1), bf(d0), bf(d1), m0, m1)
        scores = scores.astype(jnp.float32)
        j = jnp.argmax(scores[:, :N, :N], -1)
        i_back = jnp.argmax(scores[:, :N, :N], -2)
        mutual = jnp.take_along_axis(i_back, j, 1) == jnp.arange(N)[None]
        return jnp.where(mutual, j, -1)

    matches = fwd_and_match(lg.params, k0, k1, d0, d1, m, m)
    float(np.asarray(matches).sum())
    t0 = time.time()
    runs = 3
    for _ in range(runs):
        matches = fwd_and_match(lg.params, k0, k1, d0, d1, m, m)
        float(np.asarray(matches).sum())
    dt = (time.time() - t0) / runs
    print(f"LightGlue 9-layer {N}x{N} kps: {B/dt:.1f} pairs/s  ({dt*1000/B:.1f} ms/pair, batch {B})")


def pipeline():
    """End-to-end extraction bench (VERDICT r4 item 9): features +
    retrieval pairs + LightGlue matching for a 100-image synthetic set
    through the REAL Extraction facade (HDF5 caches, shape bucketing,
    writer threads) — catches the orchestration overheads the per-pair
    number hides. Reference contrast: hloc-style per-pair DataLoader
    loops (mpsfm/extraction/pairwise/match_sparse.py:74-132)."""
    import shutil
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from synthetic import PlaneScene, render_scene_dir

    from mpsfm_tpu.datasets.simple import SimpleParser
    from mpsfm_tpu.extraction.base import Extraction
    from mpsfm_tpu.extraction.matchers.lightglue import LightGlue

    n_images = int(os.environ.get("BENCH_PIPE_IMAGES", "100"))
    tmp = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        scene = PlaneScene(
            rng=np.random.default_rng(0), n_images=n_images, img_wh=(320, 240),
            focal=260.0, baseline=0.05, wedge=True,
        )
        render_scene_dir(
            scene, os.path.join(tmp, "scene"), rng=np.random.default_rng(0),
            write_depth=False, plane_extent=16.0,
        )
        parser = SimpleParser(os.path.join(tmp, "scene"))
        lg = LightGlue()
        lg.init_random(0)  # throughput is weight-independent

        def run(cache):
            ex = Extraction(
                {"features": "classical", "matcher": "lightglue",
                 "pairs_type": "retrieval", "n_retrieval": 20, "verbose": 0},
                parser, cache, models={"matcher": lg},
            )
            t0 = time.time()
            pairs = ex.extract_pairs()
            t_pairs = time.time() - t0
            t0 = time.time()
            ex.extract_features()
            t_feat = time.time() - t0
            t0 = time.time()
            ex.extract_matches(pairs)
            t_match = time.time() - t0
            return pairs, t_pairs, t_feat, t_match

        # cold pass compiles the bucketed programs (~40 s/bucket through
        # the remote-compile tunnel); the steady-state number is the warm
        # pass on a FRESH artifact cache (recompute everything, reuse jit)
        run(os.path.join(tmp, "cache_cold"))
        pairs, t_pairs, t_feat, t_match = run(os.path.join(tmp, "cache_warm"))
        total = t_pairs + t_feat + t_match
        print(
            f"pipeline {n_images} imgs / {len(pairs)} pairs (warm): "
            f"retrieval {t_pairs:.1f}s, features {t_feat:.1f}s "
            f"({n_images/t_feat:.1f} img/s), matching {t_match:.1f}s "
            f"({len(pairs)/t_match:.1f} pairs/s), total {total:.1f}s "
            f"({len(pairs)/total:.1f} pairs/s e2e)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    if "--pipeline" in sys.argv:
        pipeline()
    else:
        main()
        lightglue()
