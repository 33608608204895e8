"""SuperPoint in Flax — architecture-exact for weight porting.

TPU-native replacement for the reference's SuperPoint wrapper around
SuperGluePretrainedNetwork (mpsfm/extraction/imagewise/features/models/
superpoint.py + configs/superpoint.yaml: nms_radius 4, 6000 keypoints,
resize 1600). Weights port 1:1 from the magicleap checkpoint via
``params_from_torch_state_dict`` (torch conv [O,I,kh,kw] -> flax
[kh,kw,I,O]). Inference is one jitted forward per resize bucket; NMS is
maxpool-based (VPU-friendly), top-k selection is a single jnp.top_k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


class SuperPointNet(nn.Module if nn else object):
    """VGG-style encoder + detector/descriptor heads (magicleap layout)."""

    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 1) in [0,1]
        relu = nn.relu
        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME")
        pool = lambda y: nn.max_pool(y, (2, 2), (2, 2))

        y = relu(conv(64, name="conv1a")(x))
        y = relu(conv(64, name="conv1b")(y))
        y = pool(y)
        y = relu(conv(64, name="conv2a")(y))
        y = relu(conv(64, name="conv2b")(y))
        y = pool(y)
        y = relu(conv(128, name="conv3a")(y))
        y = relu(conv(128, name="conv3b")(y))
        y = pool(y)
        y = relu(conv(128, name="conv4a")(y))
        y = relu(conv(128, name="conv4b")(y))

        cPa = relu(conv(256, name="convPa")(y))
        scores = nn.Conv(65, (1, 1), name="convPb")(cPa)  # (B, H/8, W/8, 65)

        cDa = relu(conv(256, name="convDa")(y))
        desc = nn.Conv(self.descriptor_dim, (1, 1), name="convDb")(cDa)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return scores, desc


def params_from_torch_state_dict(state_dict) -> dict:
    """magicleap superpoint_v1.pth -> flax params tree."""
    params = {}
    for name in (
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ):
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        params[name] = {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}
    return {"params": params}


def simple_nms(scores, radius: int):
    """Iterated maxpool NMS (SuperGlue's simple_nms)."""

    def maxpool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2 * radius + 1, 2 * radius + 1), (1, 1, 1), "SAME"
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(2):
        supp_mask = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == maxpool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


@partial(jax.jit, static_argnames=("max_kps", "nms_radius"))
def _postprocess(scores65, desc_map, max_kps: int, nms_radius: int, threshold: float):
    """scores65 (B,Hc,Wc,65) -> (kps (B,K,2), scores (B,K), desc (B,K,D))."""
    B, Hc, Wc, _ = scores65.shape
    prob = jax.nn.softmax(scores65, axis=-1)[..., :64]
    heat = prob.reshape(B, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    heat = simple_nms(heat, nms_radius)
    H, W = Hc * 8, Wc * 8
    flat = heat.reshape(B, -1)
    vals, idx = jax.lax.top_k(flat, max_kps)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    kps = jnp.stack([xs, ys], -1)
    valid = vals > threshold
    # bilinear descriptor sampling at kp/8 on the coarse map
    gx = (xs + 0.5) / 8.0 - 0.5
    gy = (ys + 0.5) / 8.0 - 0.5
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, Wc - 1)
    x1 = jnp.clip(x0 + 1, 0, Wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Hc - 1)
    y1 = jnp.clip(y0 + 1, 0, Hc - 1)
    fx = jnp.clip(gx - x0, 0, 1)[..., None]
    fy = jnp.clip(gy - y0, 0, 1)[..., None]
    bidx = jnp.arange(B)[:, None]
    d = (
        desc_map[bidx, y0, x0] * (1 - fx) * (1 - fy)
        + desc_map[bidx, y0, x1] * fx * (1 - fy)
        + desc_map[bidx, y1, x0] * (1 - fx) * fy
        + desc_map[bidx, y1, x1] * fx * fy
    )
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    return kps, vals, d, valid


class SuperPoint:
    """Host wrapper: image -> keypoints/scores/descriptors."""

    default_conf = {
        "nms_radius": 4,
        "max_keypoints": 6000,
        "detection_threshold": 0.005,
        "resize_max": 1600,
        "weights_path": None,
    }
    detection_noise = 1.0  # px (reference superpoint.yaml)

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}
        self.net = SuperPointNet()
        self.params = None
        wp = self.conf.get("weights_path")
        from mpsfm_tpu.extraction.weights import maybe_resolve

        wp = maybe_resolve(wp)
        if wp:
            import torch

            sd = torch.load(wp, map_location="cpu")
            from mpsfm_tpu.extraction.manifest import check_state_dict

            check_state_dict(sd, "superpoint", where=str(wp))
            self.params = params_from_torch_state_dict(sd)
        self._fwd = jax.jit(lambda p, x: self.net.apply(p, x))

    def init_random(self, seed=0):
        self.params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 1)))

    def __call__(self, image_gray: np.ndarray):
        """image_gray (H,W) float [0,1]. Returns dict with keypoints in
        original pixel coords, scores, descriptors."""
        assert self.params is not None, "load weights or call init_random() first"
        H, W = image_gray.shape
        # pad to /8
        H8 = ((H + 7) // 8) * 8
        W8 = ((W + 7) // 8) * 8
        img = np.zeros((H8, W8), np.float32)
        img[:H, :W] = image_gray
        scores65, desc_map = self._fwd(self.params, jnp.asarray(img)[None, :, :, None])
        kps, vals, desc, valid = _postprocess(
            scores65, desc_map, self.conf["max_keypoints"], self.conf["nms_radius"],
            self.conf["detection_threshold"],
        )
        kps = np.asarray(kps[0])
        vals = np.asarray(vals[0])
        desc = np.asarray(desc[0])
        keep = np.asarray(valid[0]) & (kps[:, 0] < W) & (kps[:, 1] < H)
        return {
            "keypoints": kps[keep],
            "scores": vals[keep],
            "descriptors": desc[keep],
        }
