"""Mutual nearest-neighbor descriptor matching, batched (JAX).

Replaces the reference's NearestNeighbor matcher
(mpsfm/extraction/pairwise/models/nearest_neighbor.py): cosine similarity,
mutual check, optional ratio and distance thresholds. One jitted call per
(N0, N1) bucket; the similarity matrix is a single MXU matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def _match(d0, d1, v0, v1, ratio_thresh, dist_thresh):
    sim = jnp.einsum("nd,md->nm", d0, d1, precision=jax.lax.Precision.HIGHEST)
    sim = jnp.where(v0[:, None] & v1[None, :], sim, -2.0)
    best1 = jnp.argmax(sim, axis=1)
    s_best = jnp.max(sim, axis=1)
    # second best for ratio test (on distance^2 = 2-2sim for unit vectors)
    sim2 = sim.at[jnp.arange(sim.shape[0]), best1].set(-2.0)
    s_second = jnp.max(sim2, axis=1)
    best0 = jnp.argmax(sim, axis=0)
    mutual = best0[best1] == jnp.arange(sim.shape[0])
    d_best = jnp.sqrt(jnp.maximum(2 - 2 * s_best, 0))
    d_second = jnp.sqrt(jnp.maximum(2 - 2 * s_second, 0))
    ok = mutual & v0
    ok &= jnp.where(ratio_thresh > 0, d_best <= ratio_thresh * d_second, True)
    ok &= jnp.where(dist_thresh > 0, d_best <= dist_thresh, True)
    matches0 = jnp.where(ok, best1, -1)
    scores0 = jnp.where(ok, (s_best + 1) / 2, 0.0)
    return matches0, scores0


class MutualNNMatcher:
    default_conf = {"ratio_threshold": 0.95, "distance_threshold": 0.0}

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}

    def __call__(self, desc0: np.ndarray, desc1: np.ndarray):
        def bucket(n):
            b = 256
            while b < n:
                b *= 2
            return b

        n0, n1 = len(desc0), len(desc1)
        b0, b1 = bucket(n0), bucket(n1)
        d0 = np.zeros((b0, desc0.shape[1]), np.float32)
        d1 = np.zeros((b1, desc1.shape[1]), np.float32)
        d0[:n0] = desc0
        d1[:n1] = desc1
        v0 = np.zeros(b0, bool)
        v1 = np.zeros(b1, bool)
        v0[:n0] = True
        v1[:n1] = True
        m0, s0 = _match(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(v0), jnp.asarray(v1),
            jnp.float32(self.conf["ratio_threshold"]), jnp.float32(self.conf["distance_threshold"]),
        )
        m0 = np.asarray(m0)[:n0]
        s0 = np.asarray(s0)[:n0]
        m0 = np.where(m0 < n1, m0, -1)
        return {"matches0": m0, "matching_scores0": s0}
