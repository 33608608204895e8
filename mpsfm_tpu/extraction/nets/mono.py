"""Monocular metric depth + surface-normal estimator (Flax ViT-DPT).

The framework's native neural prior backend — the architecture class of
the reference's Metric3Dv2/DSINE wrappers (SURVEY.md §2.4:
mpsfm/extraction/imagewise/geometry/models/depth/metric3dv2.py:29-120,
normals/dsine.py): one trunk, three readouts:

  * depth: softplus-activated metric depth (canonical-focal convention:
    predictions scale by f/f_canonical like Metric3Dv2),
  * normals: L2-normalized 3-vector + kappa concentration channel; kappa
    maps to angular variance exactly like the reference's DSINE wrapper
    (alpha = arccos-free small-angle 1/kappa approximation),
  * confidence: sigmoid channel -> relative depth std.

Flip-consistency (the reference's `-fc` configs): forward the
horizontally mirrored image in the same batch and fuse mean/variance —
`predict(..., flip_consistency=True)`.

Weights: `mono_params_from_torch` accepts a timm-style trunk + DPT head
state dict; random init otherwise (smoke/integration paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

from mpsfm_tpu.extraction.nets.dpt import DPTDecoder, Head
from mpsfm_tpu.extraction.nets.vit import ViT


def kappa_to_alpha(kappa):
    """vMF concentration -> expected angular error in radians (the exact
    DSINE formula the reference uses, dsine.py:22-23)."""
    return (2 * kappa / (kappa**2 + 1)) + np.exp(-kappa * np.pi) * np.pi / (
        1 + np.exp(-kappa * np.pi)
    )


class MonoViT(nn.Module if nn else object):
    dim: int = 192
    depth_blocks: int = 6
    num_heads: int = 3
    patch: int = 16
    feat: int = 64

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) in [0,1]
        hooks = tuple(
            sorted({self.depth_blocks // 4, self.depth_blocks // 2, (3 * self.depth_blocks) // 4, self.depth_blocks - 1})
        )
        feats = ViT(
            self.dim, self.depth_blocks, self.num_heads, self.patch, hooks=hooks, name="trunk"
        )(x)
        while len(feats) < 4:  # tiny trunks: repeat the last hook
            feats = feats + [feats[-1]]
        fused = DPTDecoder(self.feat, name="decoder")(feats)
        B, h, w, _ = fused.shape
        H, W = x.shape[1], x.shape[2]
        fused = jax.image.resize(fused, (B, H, W, fused.shape[-1]), "bilinear")
        depth = nn.softplus(Head(1, self.feat, name="depth_head")(fused))[..., 0]
        nk = Head(4, self.feat, name="normal_head")(fused)
        n = nk[..., :3]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
        kappa = nn.softplus(nk[..., 3]) + 0.01
        conf = nn.sigmoid(Head(1, self.feat, name="conf_head")(fused))[..., 0]
        return {"depth": depth, "normals": n, "kappa": kappa, "conf": conf}


class ViTMonoBackend:
    """Prior-backend interface around MonoViT: rgb -> {depth,
    depth_variance, normals, normals_variance, valid} (numpy, full res).

    conf: weights_path (flax msgpack or torch .pth), canonical_focal,
    flip_consistency, depth_uncertainty / prior_std_multiplier
    calibration keys (see priors.CALIBRATIONS), arch overrides."""

    def __init__(self, conf=None):
        conf = dict(conf or {})
        self.conf = conf
        self.canonical_focal = float(conf.get("canonical_focal", 500.0))
        self.flip_consistency = bool(conf.get("flip_consistency", False))
        self.depth_uncertainty = conf.get("depth_uncertainty", 0.05)
        # fixed processing resolution (long side), the convention of every
        # reference mono net (e.g. Metric3Dv2 resizes to its canonical
        # input and rescales depth by the focal ratio): inputs are resized
        # so train-time and inference-time token grids share one
        # pos-embedding layout; depth values are resolution-invariant and
        # the focal entering the canonical-scale conversion is the
        # *effective* (resized) focal.
        self.resize_long = conf.get("resize_long")
        self.net = MonoViT(
            dim=int(conf.get("dim", 192)),
            depth_blocks=int(conf.get("depth_blocks", 6)),
            num_heads=int(conf.get("num_heads", 3)),
            patch=int(conf.get("patch", 16)),
            feat=int(conf.get("feat", 64)),
        )
        self.params = None
        wp = conf.get("weights_path")
        from mpsfm_tpu.extraction.weights import maybe_resolve

        wp = maybe_resolve(wp)
        if wp:
            self.params = load_mono_params(wp, self.net)
        self._fwd = jax.jit(lambda p, x: self.net.apply(p, x))

    def _ensure_params(self, x):
        if self.params is None:
            self.params = self.net.init(jax.random.PRNGKey(0), x)

    def __call__(self, image_rgb, intrinsics=None, **kw):
        img = np.asarray(image_rgb, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        H, W = img.shape[:2]
        f_scale = 1.0
        Hr, Wr = H, W
        if self.resize_long and max(H, W) != int(self.resize_long):
            import cv2

            f_scale = float(self.resize_long) / max(H, W)
            Wr, Hr = max(1, round(W * f_scale)), max(1, round(H * f_scale))
            img = cv2.resize(img, (Wr, Hr), interpolation=cv2.INTER_AREA)
        p = self.net.patch if hasattr(self.net, "patch") else 16
        Hp, Wp = ((Hr + p - 1) // p) * p, ((Wr + p - 1) // p) * p
        xb = np.zeros((1, Hp, Wp, 3), np.float32)
        xb[0, :Hr, :Wr] = img
        if self.flip_consistency:
            xb = np.concatenate([xb, xb[:, :, ::-1]], 0)
        x = jnp.asarray(xb)
        self._ensure_params(x)
        out = jax.tree_util.tree_map(np.asarray, self._fwd(self.params, x))

        def up(a):
            """Processing res -> native res (depth values are invariant)."""
            if (Hr, Wr) == (H, W):
                return a
            import cv2

            return cv2.resize(np.ascontiguousarray(a, np.float32), (W, H),
                              interpolation=cv2.INTER_LINEAR).astype(np.float64)

        depth = up(out["depth"][0][:Hr, :Wr].astype(np.float64))
        normals = up(out["normals"][0][:Hr, :Wr].astype(np.float64))
        normals = normals / np.clip(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-8, None)
        kappa = up(out["kappa"][0][:Hr, :Wr].astype(np.float64))
        conf = up(out["conf"][0][:Hr, :Wr].astype(np.float64))
        if intrinsics is not None:
            f = 0.5 * (float(intrinsics[0]) + float(intrinsics[1])) * f_scale
            depth = depth * (f / self.canonical_focal)
        result = {
            "depth": depth,
            "valid": depth > 0,
            # model-confidence variance channel; the scene-level Depth
            # model adds the proportional depth_uncertainty·d floor.
            "depth_variance": np.square(depth * np.clip(1.0 - conf, 1e-3, None)),
            "normals": normals,
            # kappa -> angular variance alpha^2 (reference
            # metric3dv2.py:117 uses kappa_to_alpha(kappa)**2)
            "normals_variance": kappa_to_alpha(np.maximum(kappa, 1e-3)) ** 2,
        }
        if self.flip_consistency:
            d2 = up(out["depth"][1][:, ::-1][:Hr, :Wr].astype(np.float64))  # unflip
            if intrinsics is not None:
                d2 = d2 * (
                    0.5 * (float(intrinsics[0]) + float(intrinsics[1])) * f_scale
                    / self.canonical_focal
                )
            result["depth2"] = d2
            c2 = up(out["conf"][1][:, ::-1][:Hr, :Wr].astype(np.float64))
            result["depth_variance2"] = np.square(d2 * np.clip(1.0 - c2, 1e-3, None))
            n2 = up(out["normals"][1][:, ::-1][:Hr, :Wr].astype(np.float64)).copy()
            n2[..., 0] *= -1.0  # mirror the x component back
            n2 = n2 / np.clip(np.linalg.norm(n2, axis=-1, keepdims=True), 1e-8, None)
            result["normals2"] = n2
            result["normals2_variance"] = (
                kappa_to_alpha(
                    np.maximum(up(out["kappa"][1][:, ::-1][:Hr, :Wr].astype(np.float64)), 1e-3)
                )
                ** 2
            )
        return result


def load_mono_params(path, net: MonoViT):
    """Load flax msgpack or convert a torch state dict."""
    from pathlib import Path

    p = Path(path)
    if p.suffix in (".msgpack", ".flax"):
        import flax.serialization as ser

        dummy = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        return ser.from_bytes(dummy, p.read_bytes())
    import torch

    sd = torch.load(p, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return mono_params_from_torch({k: v.numpy() for k, v in sd.items()}, depth=net.depth_blocks)


def mono_params_from_torch(sd, depth: int = 6):
    """Torch naming: trunk.* (timm ViT), decoder/heads mirrored 1:1."""
    from mpsfm_tpu.extraction.nets.vit import vit_params_from_torch

    trunk = vit_params_from_torch(sd, depth=depth, prefix="trunk.")["params"]

    def conv(k):
        return {
            "kernel": np.transpose(np.asarray(sd[k + ".weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(sd[k + ".bias"]),
        }

    def rcu(prefix):
        return {"conv1": conv(prefix + ".conv1"), "conv2": conv(prefix + ".conv2")}

    dec = {}
    for i in range(4):
        dec[f"read_{i}"] = conv(f"decoder.read_{i}")
        dec[f"proj_{i}"] = conv(f"decoder.proj_{i}")
    for i in range(4):
        f = {}
        if i != 3:
            f["rcu1"] = rcu(f"decoder.fuse_{i}.rcu1")
        f["rcu2"] = rcu(f"decoder.fuse_{i}.rcu2")
        f["project"] = conv(f"decoder.fuse_{i}.project")
        dec[f"fuse_{i}"] = f

    def head(prefix):
        return {"conv1": conv(prefix + ".conv1"), "conv2": conv(prefix + ".conv2"), "out": conv(prefix + ".out")}

    return {
        "params": {
            "trunk": trunk,
            "decoder": dec,
            "depth_head": head("depth_head"),
            "normal_head": head("normal_head"),
            "conf_head": head("conf_head"),
        }
    }
