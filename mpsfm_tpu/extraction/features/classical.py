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


@partial(jax.jit, static_argnames=("max_kps", "nms_radius", "patch"))
def _detect_describe(img, max_kps: int, nms_radius: int, threshold: float, patch: int):
    H, W = img.shape
    sobel_x = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
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
    # suppress borders
    b = patch
    mask = jnp.zeros_like(lam_min).at[b:-b, b:-b].set(1.0)
    resp = simple_nms((lam_min * mask)[None], nms_radius)[0]

    vals, idx = jax.lax.top_k(resp.reshape(-1), max_kps)
    ys = (idx // W).astype(jnp.int32)
    xs = (idx % W).astype(jnp.int32)
    valid = vals > threshold

    # descriptors: two-scale 8x8 normalized patches of blurred image
    blur1 = _conv2(img, _gauss_kernel(1.0, 2))
    blur2 = _conv2(img, _gauss_kernel(3.0, 5))

    offs = jnp.arange(-(patch // 2), patch // 2, dtype=jnp.int32)

    def patch_at(src, step):
        py = jnp.clip(ys[:, None, None] + offs[None, :, None] * step, 0, H - 1)
        px = jnp.clip(xs[:, None, None] + offs[None, None, :] * step, 0, W - 1)
        p = src[py, px].reshape(max_kps, -1)
        p = p - p.mean(-1, keepdims=True)
        return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)

    desc = jnp.concatenate([patch_at(blur1, 1), patch_at(blur2, 3)], -1)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    kps = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], -1)
    return kps, vals, desc, valid


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
            return jax.vmap(
                lambda im: _detect_describe(
                    im, c["max_keypoints"], c["nms_radius"], c["detection_threshold"], c["patch"]
                )
            )(imgs)

        return fn

    @staticmethod
    def postprocess(out):
        kps, vals, desc, valid = out
        keep = np.asarray(valid)
        return {
            "keypoints": np.asarray(kps)[keep],
            "scores": np.asarray(vals)[keep],
            "descriptors": np.asarray(desc)[keep],
        }
