"""Device-side depth-observation rows for the fused refinement chain.

The reference rebuilds its depth residual blocks on the host from the
freshly refined depth maps before every BA
(mpsfm/sfm/mapper/bundle_adjustment.py:124-182 — depth at keypoints,
scale filter, magnitudes d²/σ², robust scale m·σ/d). On the tunneled
TPU that host rebuild forces a blocking read of the integration output
(~35-100 ms) between the BiNI solve and the BA solve of every
refinement iteration. Here the rows are computed ON DEVICE from the
device-resident log-depth grids (ImagePriors._z0_shift_dev or the
integrate_bundle_deferred handles), so integrate -> BA chains with no
intermediate read:

  sample_logd:       bilinear depth sample at keypoints (linear-space
                     interpolation, matching Depth.data_at_kps /
                     utils/interp.sample_bilinear semantics in f32);
  build_depth_grids: scale filter, magnitudes, robust scales, optional
                     in-program MAD truncation multiplier
                     (shift_scale.update_truncation_multiplier), and the
                     scatter into the dense (C,P) grids of DenseBAData.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpsfm_tpu.ba.solver import _rotmat_cols
from mpsfm_tpu.geometry.rotations import quat_normalize


@jax.jit
def sample_logd(zlog, shift, gx, gy):
    """log of the bilinear sample of exp(zlog + shift) at grid coords
    (gx, gy) — identical math to Depth.data_at_kps (linear-space
    bilinear, border clamp, pixel centers at +0.5; the host samples in
    f64, this runs in f32: ~1e-7 relative difference)."""
    d = jnp.exp(zlog + shift)
    H, W = d.shape
    x = gx - 0.5
    y = gy - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(d.dtype)
    fy = (y - y0).astype(d.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x0i + 1, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y0i + 1, 0, H - 1)
    v = (
        d[y0c, x0c] * (1 - fx) * (1 - fy)
        + d[y0c, x1c] * fx * (1 - fy)
        + d[y1c, x0c] * (1 - fx) * fy
        + d[y1c, x1c] * fx * fy
    )
    return jnp.log(jnp.maximum(v, 1e-8))


@partial(jax.jit, static_argnames=("C", "P", "scale_filter", "compute_trunc"))
def build_depth_grids(
    logd,      # (Cr,Sd) f32 sampled log depths (stacked sample_logd rows)
    sigma2,    # (Cr,Sd) f32 per-kp depth variances (uncertainty_update)
    ptidx,     # (Cr,Sd) int32 local point index; >=P marks padding (dropped)
    cam_rows,  # (Cr,) int32 camera (local) index of each row block
    quat, t, xyz,          # initial BA state (for the projected z)
    m_base,    # scalar: param_multiplier * rob_std [* trunc when not computed here]
    sff,       # scale_filter_factor
    min_trunc, # floor for the in-program truncation multiplier (-inf: none)
    C: int,
    P: int,
    scale_filter: bool,
    compute_trunc: bool,
):
    """Returns (d_logt, d_w, d_scale) dense (C,P) grids + the truncation
    multiplier actually applied (1.0 when compute_trunc=False).

    Mirrors problem.build_ba_data's host depth section exactly: mask =
    padding & scale filter (depths>0 is vacuous for exp), d_w = d²/σ²,
    d_scale = m·σ/d; and shift_scale.update_truncation_multiplier's MAD
    fit over the UNfiltered whitened log residuals."""
    q = quat_normalize(quat)
    R = _rotmat_cols(q)
    Xg = xyz[jnp.clip(ptidx, 0, xyz.shape[0] - 1)]  # (Cr,Sd,3); padding masked below
    z = (
        R[6][cam_rows][:, None] * Xg[..., 0]
        + R[7][cam_rows][:, None] * Xg[..., 1]
        + R[8][cam_rows][:, None] * Xg[..., 2]
        + t[cam_rows, 2][:, None]
    )
    depths = jnp.exp(logd)
    mask0 = ptidx < P
    mask = mask0
    if scale_filter:
        div = depths / jnp.clip(z, 1e-6, None)
        mask = mask & (div < sff) & (div > 1.0 / sff)
    trunc = jnp.asarray(1.0, logd.dtype)
    if compute_trunc:
        log_stds = jnp.clip(jnp.sqrt(sigma2) / depths, 1e-6, None)
        whit = (logd - jnp.log(jnp.clip(z, 1e-8, None))) / log_stds
        wv = jnp.where(mask0, whit, jnp.nan)
        mu = jnp.nanmedian(wv)
        trunc = 1.4826 * jnp.nanmedian(jnp.abs(wv - mu))
        trunc = jnp.where(jnp.isnan(trunc), 1.0, jnp.maximum(trunc, min_trunc))
    m = m_base * trunc
    w = jnp.where(mask, depths * depths / jnp.clip(sigma2, 1e-6, None), 0.0)
    sc = jnp.where(mask, m * jnp.sqrt(sigma2) / depths, 1.0)
    cidx = jnp.broadcast_to(cam_rows[:, None], ptidx.shape)
    pt_sc = jnp.where(mask, ptidx, P)  # masked rows -> dropped
    d_logt = jnp.zeros((C, P), logd.dtype).at[cidx, pt_sc].set(logd, mode="drop")
    d_w = jnp.zeros((C, P), logd.dtype).at[cidx, pt_sc].set(w, mode="drop")
    d_scale = jnp.ones((C, P), logd.dtype).at[cidx, pt_sc].set(sc, mode="drop")
    return d_logt, d_w, d_scale, trunc
