"""On-scene training of the framework-native MonoViT prior.

The reference obtains monocular depth/normal priors by downloading
pretrained checkpoints (mpsfm/extraction/base.py download hooks); in a
zero-egress deployment the framework instead FITS its native prior net
(nets/mono.py MonoViT) to posed RGB-D views of the scene — e.g. an
initial mapping pass with sensor depth — and then uses its *predictions*
(depth + normals + calibrated variances) as monocular priors when
registering new, low-overlap captures. That exercises the exact
capability the reference's neural priors provide: depth-lifted
registration (reference mpsfm/sfm/mapper/registration.py:375-391) fed by
a real trained network forward, with the uncertainty chain driven by the
net's own confidence/kappa heads.

Losses (all masked by validity):
  * depth: heteroscedastic log-depth NLL with sigma_rel = 1 - conf, the
    same parameterization the backend exports as
    depth_variance = (d * (1-conf))^2 (mono.py ViTMonoBackend) — the
    confidence head is trained to *calibrate* itself against the net's
    actual residuals, mirroring how the reference calibrates
    depth_uncertainty per model (reference scene/image/depth.py:14-30).
  * normals: heteroscedastic angular NLL with alpha = kappa_to_alpha(
    kappa), the exact vMF-concentration -> angular-std mapping the
    reference's DSINE wrapper uses (reference normals/dsine.py:22-23);
    theta^2 ~ 2(1 - <n, n_gt>).

Augmentation: random crops at patch-aligned offsets (static shapes for
XLA) + horizontal flips with the normal x-component mirrored — the flip
convention of the reference's flip-consistency passes.

Depth is trained in the canonical-focal convention (d_canonical =
d_metric * f_canonical / f), matching Metric3Dv2's scale handling and
the backend's inverse rescale at inference (mono.py:127-129).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _pad_to_patch(img, patch):
    H, W = img.shape[:2]
    Hp, Wp = ((H + patch - 1) // patch) * patch, ((W + patch - 1) // patch) * patch
    if (Hp, Wp) == (H, W):
        return img
    out = np.zeros((Hp, Wp) + img.shape[2:], img.dtype)
    out[:H, :W] = img
    return out


def kappa_to_alpha_jnp(kappa):
    """Differentiable vMF kappa -> expected angular error (radians)."""
    return (2 * kappa / (kappa**2 + 1)) + jnp.exp(-kappa * jnp.pi) * jnp.pi / (
        1 + jnp.exp(-kappa * jnp.pi)
    )


def _loss_fn(net, params, batch):
    out = net.apply(params, batch["rgb"])
    m = batch["valid"]
    msum = jnp.maximum(m.sum(), 1.0)

    # --- depth: log-L1 + direct confidence calibration ---
    d = jnp.maximum(out["depth"], 1e-4)
    r = jnp.log(d) - jnp.log(jnp.maximum(batch["depth"], 1e-4))
    loss_d = (jnp.abs(r) * m).sum() / msum
    # conf is supervised by regression against the DETACHED residual:
    # target sigma_rel = |r|, i.e. conf -> 1 - |r|. A heteroscedastic NLL
    # through sigma = 1 - sigmoid(conf_head) has a saturation trap (early
    # large residuals push conf to 0, where the sigmoid gradient — and
    # with it the whole calibration signal — vanishes); the MSE keeps a
    # strong gradient everywhere, and the backend exports exactly this
    # parameterization as depth_variance = (d * (1-conf))^2.
    sig_tgt = jax.lax.stop_gradient(jnp.clip(jnp.abs(r), 0.01, 1.0))
    loss_cal = (jnp.square((1.0 - out["conf"]) - sig_tgt) * m).sum() / msum
    loss_d = loss_d + loss_cal

    # --- normals: heteroscedastic angular NLL via kappa_to_alpha ---
    dot = jnp.clip((out["normals"] * batch["normals"]).sum(-1), -1.0, 1.0)
    theta2 = 2.0 * (1.0 - dot)
    alpha = jnp.clip(kappa_to_alpha_jnp(out["kappa"]), 1e-3, np.pi)
    nll_n = 0.5 * theta2 / jnp.square(alpha) + jnp.log(alpha)
    loss_n = (nll_n * m).sum() / msum + ((1.0 - dot) * m).sum() / msum

    loss = loss_d + loss_n
    aux = {
        "loss": loss,
        "log_d_mae": (jnp.abs(r) * m).sum() / msum,
        "ang_err": (jnp.sqrt(theta2 + 1e-12) * m).sum() / msum,
    }
    return loss, aux


def _make_crop_batch(rng, images, depths, normals, valids, crop_hw, batch, patch, flip_aug):
    """Host-side batch assembly: random view, patch-aligned crop, optional
    horizontal flip (normals x mirrored). Static output shapes.

    NOTE on crops vs full frames: the ViT's pos embedding is resized to
    span whatever grid it receives (nets/vit.py), so a net trained on
    crops sees a different positional layout than full-frame inference.
    On-scene fitting therefore trains FULL frames at a fixed processing
    resolution (crop == frame); sub-frame crops remain available for
    scale-equivariant pretraining regimes."""
    ch, cw = crop_hw
    N, H, W = depths.shape
    rgb = np.empty((batch, ch, cw, 3), np.float32)
    dep = np.empty((batch, ch, cw), np.float32)
    nrm = np.empty((batch, ch, cw, 3), np.float32)
    val = np.empty((batch, ch, cw), np.float32)
    for b in range(batch):
        i = rng.integers(N)
        y = patch * rng.integers((H - ch) // patch + 1)
        x = patch * rng.integers((W - cw) // patch + 1)
        r_, d_, n_, v_ = (
            images[i, y : y + ch, x : x + cw],
            depths[i, y : y + ch, x : x + cw],
            normals[i, y : y + ch, x : x + cw],
            valids[i, y : y + ch, x : x + cw],
        )
        if flip_aug and rng.integers(2):
            r_, d_, v_ = r_[:, ::-1], d_[:, ::-1], v_[:, ::-1]
            n_ = n_[:, ::-1].copy()
            n_[..., 0] *= -1.0
        rgb[b], dep[b], nrm[b], val[b] = r_, d_, n_, v_
    return {"rgb": rgb, "depth": dep, "normals": nrm, "valid": val}


def train_mono(
    images,
    depths,
    normals,
    valids=None,
    *,
    net=None,
    net_conf=None,
    steps=300,
    batch=8,
    crop=None,
    lr=1e-3,
    seed=0,
    focals=None,
    canonical_focal=500.0,
    flip_aug=False,
    log_every=0,
):
    """Fit MonoViT to posed RGB-D supervision.

    images: (N,H,W,3) float in [0,1] (or uint8); depths: (N,H,W) metric;
    normals: (N,H,W,3) camera-frame unit normals; valids: (N,H,W) bool.
    focals: per-image focal lengths — depth is converted to the
    canonical-focal convention before fitting. crop=None trains full
    frames (pos-embedding-consistent with full-frame inference — see
    _make_crop_batch). Returns (net, params, history dict of final
    metrics).
    """
    import optax

    from mpsfm_tpu.extraction.nets.mono import MonoViT

    images = np.asarray(images, np.float32)
    if images.max() > 1.5:
        images = images / 255.0
    depths = np.asarray(depths, np.float32)
    normals = np.asarray(normals, np.float32)
    if valids is None:
        valids = depths > 0
    valids = np.asarray(valids, np.float32)

    if focals is not None:
        f = np.asarray(focals, np.float32).reshape(-1, 1, 1)
        depths = depths * (canonical_focal / f)

    if net is None:
        c = dict(net_conf or {})
        net = MonoViT(
            dim=int(c.get("dim", 96)),
            depth_blocks=int(c.get("depth_blocks", 4)),
            num_heads=int(c.get("num_heads", 2)),
            patch=int(c.get("patch", 16)),
            feat=int(c.get("feat", 48)),
        )
    patch = net.patch

    images = np.stack([_pad_to_patch(im, patch) for im in images])
    depths = np.stack([_pad_to_patch(d, patch) for d in depths])
    normals = np.stack([_pad_to_patch(n, patch) for n in normals])
    valids = np.stack([_pad_to_patch(v, patch) for v in valids])
    H, W = depths.shape[1:3]
    if crop is None:
        ch, cw = H, W
    else:
        ch = min(crop[0], H) // patch * patch
        cw = min(crop[1], W) // patch * patch

    rng = np.random.default_rng(seed)
    params = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, ch, cw, 3), jnp.float32)
    )
    warmup = max(1, min(steps // 10, 50, steps - 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup, decay_steps=steps, end_value=lr * 0.05
    )
    tx = optax.adamw(sched, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch_):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: _loss_fn(net, p, batch_), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux

    aux = {}
    for it in range(steps):
        b = _make_crop_batch(
            rng, images, depths, normals, valids, (ch, cw), batch, patch, flip_aug
        )
        b = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt_state, aux = step(params, opt_state, b)
        if log_every and (it % log_every == 0 or it == steps - 1):
            a = {k: float(v) for k, v in aux.items()}
            print(
                f"[train_mono] step {it}: loss {a['loss']:.4f} "
                f"log_d_mae {a['log_d_mae']:.4f} ang_err {a['ang_err']:.4f}"
            )
    history = {k: float(v) for k, v in aux.items()}
    return net, params, history


def save_mono_params(params, path):
    """Serialize trained params as flax msgpack (the format
    mono.load_mono_params reads back)."""
    import flax.serialization as ser
    from pathlib import Path

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(ser.to_bytes(params))


def fit_scene_prior(
    data_dir,
    out_path,
    *,
    net_conf=None,
    steps=300,
    batch=8,
    lr=1e-3,
    seed=0,
    canonical_focal=500.0,
    resize_long=160,
    log_every=0,
):
    """Train on an RGB-D scene directory (datasets/simple.py layout:
    images/*.png + depth/*.npy + intrinsics.yaml) and save msgpack
    weights. Normals supervision is derived from the sensor depth
    (priors.normals_from_depth) — the same geometry the measured backend
    exports. Training runs full frames at the ``resize_long`` processing
    resolution; the returned backend conf carries the same
    ``resize_long`` so inference uses an identical token grid.
    Returns (weights_path, backend_conf, history)."""
    import cv2

    from mpsfm_tpu.datasets.simple import SimpleParser
    from mpsfm_tpu.extraction.priors import normals_from_depth
    from mpsfm_tpu.utils import io

    parser = SimpleParser(data_dir)
    images, depths, normals, valids, focals = [], [], [], [], []
    for name in parser.image_names():
        rgb = io.read_image(parser.image_path(name)).astype(np.float32) / 255.0
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, -1)
        kw = parser.prior_inputs(name)
        d = np.asarray(kw["depth_measured"], np.float32)
        fx, fy, cx, cy = [float(v) for v in kw["intrinsics"][:4]]
        H, W = d.shape
        if resize_long and max(H, W) != resize_long:
            s = float(resize_long) / max(H, W)
            Wr, Hr = max(1, round(W * s)), max(1, round(H * s))
            rgb = cv2.resize(rgb, (Wr, Hr), interpolation=cv2.INTER_AREA)
            # depth values are resolution-invariant; the effective focal
            # scales with the resize (same convention as the backend)
            d = cv2.resize(d, (Wr, Hr), interpolation=cv2.INTER_AREA)
            fx, fy, cx, cy = fx * s, fy * s, cx * s, cy * s
        n = normals_from_depth(d, fx, fy, cx, cy)
        images.append(rgb)
        depths.append(d)
        normals.append(n.astype(np.float32))
        valids.append(d > 0)
        focals.append(0.5 * (fx + fy))
    net, params, history = train_mono(
        np.stack(images),
        np.stack(depths),
        np.stack(normals),
        np.stack(valids),
        net_conf=net_conf,
        steps=steps,
        batch=batch,
        crop=None,
        lr=lr,
        seed=seed,
        focals=np.asarray(focals),
        canonical_focal=canonical_focal,
        log_every=log_every,
    )
    save_mono_params(params, out_path)
    backend_conf = {
        "dim": net.dim,
        "depth_blocks": net.depth_blocks,
        "num_heads": net.num_heads,
        "patch": net.patch,
        "feat": net.feat,
        "canonical_focal": canonical_focal,
        "resize_long": resize_long,
        "weights_path": str(out_path),
    }
    return out_path, backend_conf, history
