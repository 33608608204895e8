"""Fused Pallas Cholesky solve for the BA reduced camera system.

XLA's blocked `cho_factor` on a 6Cx6C matrix costs ~8 ms on v5e at
C=64 (dispatch-bound: many small serialized fusions through HBM). This
kernel runs the whole factorize + two triangular solves with the matrix
resident in VMEM — one kernel launch, zero HBM round-trips between
steps. Right-looking rank-1 Cholesky (K serial steps of full-width VPU
vector ops) is latency-optimal at these sizes (K ≤ ~1.5k, 0.6–9 MB in
f32).

Used by ba/dense.solve_ba_dense for the Schur-reduced system
(S = Hcc − T Hpp⁻¹ Tᵀ); falls back to jax.scipy on CPU/interpret.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(S_ref, rhs_ref, x_ref, A, B, y):
    """Mosaic constraints shape the algorithm: the lane dim cannot be
    dynamically sliced and (K,1)<->(1,K) relayouts are cross-lane moves —
    so columns/rows are extracted with iota-mask reduces, the column's
    transpose comes from the (still symmetric) trailing block's row, and
    Lᵀ is accumulated row-by-row into a second scratch so the backward
    solve also only needs axis-1 mask reduces. All K² traffic stays in
    VMEM."""
    K = S_ref.shape[0]
    A[:, :] = S_ref[:, :]
    B[:, :] = jnp.zeros_like(S_ref[:, :])
    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)  # (K,1)
    colidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)  # (1,K)

    def factor_step(j, _):
        M = A[:, :]
        cmask = colidx == j  # (1,K)
        rmask = row == j  # (K,1)
        col = jnp.sum(jnp.where(cmask, M, 0.0), axis=1, keepdims=True)  # (K,1)
        # trailing block is symmetric: row j supplies the same values in
        # (1,K) layout without a relayout
        rowv = jnp.sum(jnp.where(rmask, M, 0.0), axis=0, keepdims=True)  # (1,K)
        djj = jnp.sum(jnp.where(rmask, col, 0.0))
        d = jnp.sqrt(jnp.maximum(djj, 1e-20))
        l = jnp.where(row > j, col / d, 0.0)
        l = jnp.where(rmask, d, l)  # (K,1) = column j of L
        lt = jnp.where(colidx > j, rowv / d, 0.0)
        lt = jnp.where(cmask, d, lt)  # (1,K) = that column, row layout
        upd = M - l * lt  # rank-1 trailing update
        A[:, :] = jnp.where(cmask, l, upd)  # store L's column in place
        B[:, :] = jnp.where(rmask, lt, B[:, :])  # accumulate Lᵀ row j
        return 0

    jax.lax.fori_loop(0, K, factor_step, 0)

    # forward solve L y = rhs
    y[:, :] = rhs_ref[:, :]

    def fwd_step(j, _):
        cmask = colidx == j
        rmask = row == j
        lcol = jnp.sum(jnp.where(cmask, A[:, :], 0.0), axis=1, keepdims=True)
        djj = jnp.sum(jnp.where(rmask, lcol, 0.0))
        yj = jnp.sum(jnp.where(rmask, y[:, :], 0.0)) / djj
        upd = y[:, :] - yj * jnp.where(row > j, lcol, 0.0)
        y[:, :] = jnp.where(rmask, yj, upd)
        return 0

    jax.lax.fori_loop(0, K, fwd_step, 0)

    # backward solve Lᵀ x = y; column j of Lᵀ comes from scratch B
    def bwd_step(i, _):
        j = K - 1 - i
        cmask = colidx == j
        rmask = row == j
        w = jnp.sum(jnp.where(cmask, B[:, :], 0.0), axis=1, keepdims=True)  # (K,1)
        djj = jnp.sum(jnp.where(rmask, w, 0.0))
        xj = jnp.sum(jnp.where(rmask, y[:, :], 0.0)) / djj
        upd = y[:, :] - xj * jnp.where(row < j, w, 0.0)
        y[:, :] = jnp.where(rmask, xj, upd)
        return 0

    jax.lax.fori_loop(0, K, bwd_step, 0)
    x_ref[:, :] = y[:, :]


@partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve(S, rhs, interpret: bool = False):
    """Solve S x = rhs for SPD S (K,K). K is padded to a lane multiple
    with an identity block (padding never couples to real dims)."""
    K = S.shape[0]
    Kp = ((K + 127) // 128) * 128
    dtype = S.dtype
    if Kp != K:
        Sp = jnp.zeros((Kp, Kp), dtype).at[:K, :K].set(S)
        Sp = Sp.at[jnp.arange(K, Kp), jnp.arange(K, Kp)].set(1.0)
        rp = jnp.zeros((Kp,), dtype).at[:K].set(rhs)
    else:
        Sp, rp = S, rhs
    x = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((Kp, 1), dtype),
        scratch_shapes=[
            pltpu.VMEM((Kp, Kp), dtype),
            pltpu.VMEM((Kp, Kp), dtype),
            pltpu.VMEM((Kp, 1), dtype),
        ],
        interpret=interpret,
    )(Sp, rp.reshape(Kp, 1))
    return x[:K, 0]


def on_tpu() -> bool:
    """True when the default backend is a real TPU (incl. the axon
    tunnel, whose devices report platform 'tpu'-compatible kinds)."""
    try:
        d = jax.devices()[0]
        return "tpu" in d.platform.lower() or "tpu" in str(getattr(d, "device_kind", "")).lower() or d.platform == "axon"
    except Exception:  # pragma: no cover
        return False
