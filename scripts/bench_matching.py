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


if __name__ == "__main__":
    main()
    lightglue()
