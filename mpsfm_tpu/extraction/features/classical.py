"""Classical JAX corner detector + patch descriptors (no-weights fallback).

Lets the full pipeline run end-to-end on real images when no pretrained
SuperPoint checkpoint is available (zero-egress environments): Shi-Tomasi
corner response from a Sobel structure tensor, maxpool NMS, top-k, and
multi-scale normalized intensity-patch descriptors. All device compute;
one jitted program per image-size bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.extraction.features.superpoint import simple_nms


def _conv2(img, k):
    return jax.lax.conv_general_dilated(
        img[None, :, :, None], k[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]


def _gauss_kernel(sigma, radius):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return g[:, None] * g[None, :]


def _bilinear(src, yy, xx, H, W):
    """Bilinear sample src (H,W) at float coords (..., ) -> same shape."""
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)
    fx = jnp.clip(xx - x0, 0.0, 1.0)
    return (
        src[y0, x0] * (1 - fy) * (1 - fx)
        + src[y0, x1] * (1 - fy) * fx
        + src[y1, x0] * fy * (1 - fx)
        + src[y1, x1] * fy * fx
    )


def _dominant_orientation(mag, theta, ys, xs, H, W, radius=8):
    """SIFT dominant orientation: gaussian-weighted 36-bin gradient
    histogram in a (2r+1)^2 window, circular smoothing, parabolic peak
    refinement. One histogram einsum over all keypoints, no scatters."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    py = jnp.clip(ys[:, None, None] + offs[None, :, None], 0, H - 1)
    px = jnp.clip(xs[:, None, None] + offs[None, None, :], 0, W - 1)
    mk = mag[py, px]
    tk = theta[py, px]
    d = offs.astype(jnp.float32) / radius
    gw = jnp.exp(-0.5 * (d[:, None] ** 2 + d[None, :] ** 2) / (0.5**2))
    mk = mk * gw
    o = (tk / (2 * jnp.pi) * 36.0) % 36.0
    o0 = jnp.floor(o)
    f = o - o0
    bins = jnp.arange(36, dtype=jnp.float32)
    wbin = (bins == (o0 % 36)[..., None]) * (1 - f[..., None]) + (
        bins == ((o0 + 1) % 36)[..., None]
    ) * f[..., None]
    hist = (wbin * mk[..., None]).sum((1, 2))  # (K,36)
    # circular smoothing [1,4,6,4,1]/16 twice
    for _ in range(2):
        hist = (
            6 * hist
            + 4 * (jnp.roll(hist, 1, -1) + jnp.roll(hist, -1, -1))
            + (jnp.roll(hist, 2, -1) + jnp.roll(hist, -2, -1))
        ) / 16.0
    peak = jnp.argmax(hist, -1)
    hp = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
    hl = jnp.take_along_axis(hist, ((peak - 1) % 36)[:, None], 1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % 36)[:, None], 1)[:, 0]
    delta = 0.5 * (hl - hr) / jnp.maximum(hl - 2 * hp + hr, 1e-12)
    delta = jnp.clip(-delta, -0.5, 0.5)
    return (peak.astype(jnp.float32) + delta) * (2 * jnp.pi / 36.0)


def _sift_patch_descriptor(mag, theta, ys, xs, ang, step, H, W):
    """Rotation-aware SIFT descriptor: 16x16 gradient samples on a grid
    rotated by the dominant orientation `ang` (spacing `step`), gradient
    orientations taken relative to `ang`; 4x4 cells x 8 bins, bilinear
    cell/bin weighting, gaussian window, clip-0.2 renorm. Vectorized over
    all keypoints — the histogram accumulation is one einsum (MXU)."""
    K = ys.shape[0]
    u = (jnp.arange(16, dtype=jnp.float32) - 7.5) * step
    ca = jnp.cos(ang)[:, None, None]
    sa = jnp.sin(ang)[:, None, None]
    du = u[None, :, None]
    dv = u[None, None, :]
    dx = dv * ca - du * sa
    dy = dv * sa + du * ca
    yy = ys[:, None, None].astype(jnp.float32) + dy
    xx = xs[:, None, None].astype(jnp.float32) + dx
    mk = _bilinear(mag, yy, xx, H, W)  # (K,16,16)
    tk = _bilinear(theta, yy, xx, H, W) - ang[:, None, None]
    # gaussian window over the patch
    d = (jnp.arange(16, dtype=jnp.float32) - 7.5) / 8.0
    gw = jnp.exp(-0.5 * (d[:, None] ** 2 + d[None, :] ** 2) / (0.5**2))
    mk = mk * gw
    # soft orientation bins (8)
    o = (tk / (2 * jnp.pi) * 8.0) % 8.0
    o0 = jnp.floor(o)
    f = o - o0
    bins = jnp.arange(8, dtype=jnp.float32)
    wbin = (bins == (o0 % 8)[..., None]) * (1.0 - f[..., None]) + (
        bins == ((o0 + 1) % 8)[..., None]
    ) * f[..., None]
    wbin = wbin * mk[..., None]  # (K,16,16,8)
    # bilinear cell weights along each axis: sample i -> cell coord i/4 - 0.5
    pos = (jnp.arange(16, dtype=jnp.float32) + 0.5) / 4.0 - 0.5
    cells = jnp.arange(4, dtype=jnp.float32)
    cw = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - cells[None, :]))  # (16,4)
    desc = jnp.einsum("kyxb,yr,xc->krcb", wbin, cw, cw).reshape(K, 128)
    # SIFT normalization: L2 -> clip 0.2 -> L2
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = jnp.minimum(desc, 0.2)
    return desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)


_SOBEL = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0


def _octave_features(img, n_kps: int, nms_radius: int, threshold: float):
    """Shi-Tomasi detection + oriented two-scale SIFT descriptors on ONE
    octave image. Returns (kps (n,2) octave px, vals, desc (n,256), valid)."""
    H, W = img.shape
    sobel_x = jnp.asarray(_SOBEL)
    gx = _conv2(img, sobel_x)
    gy = _conv2(img, sobel_x.T)
    g = _gauss_kernel(1.5, 3)
    Ixx = _conv2(gx * gx, g)
    Iyy = _conv2(gy * gy, g)
    Ixy = _conv2(gx * gy, g)
    # Shi-Tomasi: smaller eigenvalue of the structure tensor
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    lam_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    b = 16
    mask = jnp.zeros_like(lam_min).at[b:-b, b:-b].set(1.0)
    resp = simple_nms((lam_min * mask)[None], nms_radius)[0]

    vals, idx = jax.lax.top_k(resp.reshape(-1), n_kps)
    ys = (idx // W).astype(jnp.int32)
    xs = (idx % W).astype(jnp.int32)
    valid = vals > threshold

    # sub-pixel refinement: 1-D quadratic fit on the response
    rc = lam_min[ys, xs]
    rxp = lam_min[ys, jnp.clip(xs + 1, 0, W - 1)]
    rxm = lam_min[ys, jnp.clip(xs - 1, 0, W - 1)]
    ryp = lam_min[jnp.clip(ys + 1, 0, H - 1), xs]
    rym = lam_min[jnp.clip(ys - 1, 0, H - 1), xs]
    dx = jnp.clip(0.5 * (rxp - rxm) / jnp.maximum(2 * rc - rxp - rxm, 1e-12), -0.5, 0.5)
    dy = jnp.clip(0.5 * (ryp - rym) / jnp.maximum(2 * rc - ryp - rym, 1e-12), -0.5, 0.5)

    # gradient fields at two smoothing scales
    def grad_field(sigma, radius):
        bl = _conv2(img, _gauss_kernel(sigma, radius))
        fx = _conv2(bl, sobel_x)
        fy = _conv2(bl, sobel_x.T)
        return jnp.sqrt(fx * fx + fy * fy + 1e-12), jnp.arctan2(fy, fx)

    m1, t1 = grad_field(1.0, 2)
    m2, t2 = grad_field(2.5, 4)
    ang = _dominant_orientation(m1, t1, ys, xs, H, W)
    d1 = _sift_patch_descriptor(m1, t1, ys, xs, ang, 1.0, H, W)
    d2 = _sift_patch_descriptor(m2, t2, ys, xs, ang, 2.0, H, W)
    desc = jnp.concatenate([d1, d2], -1)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    kps = jnp.stack([xs.astype(jnp.float32) + dx, ys.astype(jnp.float32) + dy], -1)
    return kps, vals, desc, valid


@partial(jax.jit, static_argnames=("max_kps", "nms_radius", "patch", "octaves"))
def _detect_describe(
    img, max_kps: int, nms_radius: int, threshold: float, patch: int, octaves: int = 3
):
    """Multi-octave oriented SIFT-class features (COLMAP-SIFT analog for
    the no-weights operating point). Per octave: Shi-Tomasi detection +
    dominant-orientation two-scale SIFT descriptors; keypoints map back
    to full-resolution pixels. Octave keypoint quotas halve per level."""
    H, W = img.shape
    quotas = []
    q = max_kps // 2 if octaves > 1 else max_kps
    rest = max_kps - q
    quotas.append(q)
    for o in range(1, octaves):
        this = rest // (octaves - 1) if o < octaves - 1 else rest - (rest // (octaves - 1)) * (octaves - 2)
        quotas.append(this)
    out_k, out_v, out_d, out_m = [], [], [], []
    cur = img
    for o in range(octaves):
        k, v, d, m = _octave_features(cur, quotas[o], nms_radius, threshold)
        s = float(2**o)
        out_k.append((k + 0.5) * s - 0.5)
        # response magnitudes shrink with octave blur; rank within-octave
        # only (quotas already fix the budget per octave)
        out_v.append(v)
        out_d.append(d)
        out_m.append(m)
        if o + 1 < octaves:
            Hc, Wc = cur.shape
            cur = cur[: Hc - Hc % 2, : Wc - Wc % 2].reshape(Hc // 2, 2, Wc // 2, 2).mean((1, 3))
    return (
        jnp.concatenate(out_k),
        jnp.concatenate(out_v),
        jnp.concatenate(out_d),
        jnp.concatenate(out_m),
    )


class ClassicalFeatures:
    default_conf = {
        "nms_radius": 4,
        "max_keypoints": 4096,
        "detection_threshold": 1e-6,
        "patch": 8,
        "resize_max": 1600,
    }
    detection_noise = 1.5  # px — coarser localisation than SuperPoint

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}

    def __call__(self, image_gray: np.ndarray):
        kps, vals, desc, valid = _detect_describe(
            jnp.asarray(image_gray, jnp.float32),
            self.conf["max_keypoints"],
            self.conf["nms_radius"],
            self.conf["detection_threshold"],
            self.conf["patch"],
        )
        keep = np.asarray(valid)
        return {
            "keypoints": np.asarray(kps)[keep],
            "scores": np.asarray(vals)[keep],
            "descriptors": np.asarray(desc)[keep],
        }

    def batch_fn(self):
        """(B, H, W) -> padded (kps, vals, desc, valid) with leading batch
        axis — the unit `parallel.sharded_inference` shards over a mesh."""
        c = self.conf

        def fn(imgs):
            kps, vals, desc, valid = jax.vmap(
                lambda im: _detect_describe(
                    im, c["max_keypoints"], c["nms_radius"], c["detection_threshold"], c["patch"]
                )
            )(imgs)
            # fp16 descriptors for the device->host transfer: the padded
            # (B, max_kp, 256) f32 table is the dominant payload through
            # the ~30 MB/s tunnel (the hloc cache schema stores fp16
            # anyway, so nothing downstream loses precision it keeps)
            return kps, vals, desc.astype(jnp.float16), valid

        return fn

    @staticmethod
    def postprocess(out):
        kps, vals, desc, valid = out
        keep = np.asarray(valid)
        return {
            "keypoints": np.asarray(kps)[keep],
            "scores": np.asarray(vals)[keep],
            "descriptors": np.asarray(desc)[keep].astype(np.float32),
        }
