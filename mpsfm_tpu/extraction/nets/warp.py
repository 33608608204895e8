"""Dense warp regressor (RoMa-class, Flax).

Architecture class of the reference's RoMa wrapper (SURVEY.md §2.1:
mpsfm/extraction/pairwise/models/roma.py:26-124): coarse features from a
shared encoder, a global 4D correlation volume decoded into an initial
warp + certainty, then convolutional refiners at finer pyramid levels
operating on warped feature differences. Outputs a dense warp field
A->B and per-pixel certainty — consumed by the 'dense' matching mode
(NMS-subsampled) and the RoMa-sparse mode (warp endpoints assigned to
detected keypoints, extraction/matchers/dense_ncc.assign_flow_to_keypoints).

TPU-first: the correlation volume is one (hw x hw) MXU matmul; refiners
are NHWC convs; the whole two-view forward is one jitted program.
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


class ConvEncoder(nn.Module if nn else object):
    """Small strided conv pyramid: returns feats at /4 and /8."""

    feat: int = 64

    @nn.compact
    def __call__(self, x):
        c = partial(nn.Conv, kernel_size=(3, 3), padding="SAME")
        y = nn.relu(c(self.feat // 2, strides=(2, 2), name="c1")(x))
        y = nn.relu(c(self.feat // 2, name="c2")(y))
        y4 = nn.relu(c(self.feat, strides=(2, 2), name="c3")(y))
        y4 = nn.relu(c(self.feat, name="c4")(y4))
        y8 = nn.relu(c(self.feat, strides=(2, 2), name="c5")(y4))
        y8 = nn.relu(c(self.feat, name="c6")(y8))
        return y4, y8


class WarpNet(nn.Module if nn else object):
    feat: int = 64

    @nn.compact
    def __call__(self, imA, imB):  # (B,H,W,3) -> warp (B,H/4,W/4,2) px in B, certainty
        B, H, W, _ = imA.shape
        enc = ConvEncoder(self.feat, name="encoder")
        a4, a8 = enc(imA)
        b4, b8 = enc(imB)
        h8, w8 = a8.shape[1], a8.shape[2]

        # global correlation at /8: (B, ha*wa, hb*wb) — one MXU matmul
        fa = a8.reshape(B, h8 * w8, -1)
        fb = b8.reshape(B, h8 * w8, -1)
        fa = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-8)
        fb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-8)
        corr = jnp.einsum("bnd,bmd->bnm", fa, fb)
        w_soft = nn.softmax(corr * 10.0, axis=-1)  # (B, na, nb)
        # soft-argmax target coordinates in B's /8 grid
        yy, xx = jnp.meshgrid(jnp.arange(h8), jnp.arange(w8), indexing="ij")
        coords = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1).astype(imA.dtype)  # (nb,2)
        tgt = jnp.einsum("bnm,mc->bnc", w_soft, coords).reshape(B, h8, w8, 2)
        peak = corr.max(-1).reshape(B, h8, w8, 1)

        # refine at /8 with conv blocks on [feat_A, warp, peak]
        r = jnp.concatenate([a8, tgt, peak], -1)
        r = nn.relu(nn.Conv(self.feat, (3, 3), padding="SAME", name="ref8_1")(r))
        r = nn.relu(nn.Conv(self.feat, (3, 3), padding="SAME", name="ref8_2")(r))
        d8 = nn.Conv(3, (3, 3), padding="SAME", name="ref8_out")(r)  # dxy + logit
        warp8 = tgt + d8[..., :2]
        cert8 = d8[..., 2:]

        # upsample to /4 and refine with fine features
        warp4 = jax.image.resize(warp8 * 2.0, (B, a4.shape[1], a4.shape[2], 2), "bilinear")
        cert4 = jax.image.resize(cert8, (B, a4.shape[1], a4.shape[2], 1), "bilinear")
        r = jnp.concatenate([a4, warp4, cert4], -1)
        r = nn.relu(nn.Conv(self.feat, (3, 3), padding="SAME", name="ref4_1")(r))
        r = nn.relu(nn.Conv(self.feat, (3, 3), padding="SAME", name="ref4_2")(r))
        d4 = nn.Conv(3, (3, 3), padding="SAME", name="ref4_out")(r)
        warp4 = warp4 + d4[..., :2]
        cert = nn.sigmoid(cert4 + d4[..., 2:])[..., 0]
        return warp4, cert  # warp in B's /4 pixel grid


class WarpMatcher:
    """Dense-matcher interface around WarpNet (drop-in for
    DenseNCCMatcher): grayscale/rgb pair -> dense keypoints + certainty.
    The '/4 grid -> full-res px' convention matches the reference's RoMa
    to-pixel-coords step."""

    default_conf = {
        "feat": 64,
        "certainty_threshold": 0.5,
        "max_matches": 4096,
        "weights_path": None,
    }

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}
        self.net = WarpNet(feat=self.conf["feat"])
        self.params = None
        if self.conf["weights_path"]:
            import flax.serialization as ser
            from pathlib import Path

            dummy = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
            )
            self.params = ser.from_bytes(dummy, Path(self.conf["weights_path"]).read_bytes())
        self._fwd = jax.jit(lambda p, a, b: self.net.apply(p, a, b))

    def __call__(self, imgA, imgB):
        def prep(img):
            img = np.asarray(img, np.float32)
            if img.max() > 1.5:
                img = img / 255.0
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            return img

        A, B = prep(imgA), prep(imgB)
        H = max(A.shape[0], B.shape[0])
        W = max(A.shape[1], B.shape[1])
        Hb, Wb = ((H + 31) // 32) * 32, ((W + 31) // 32) * 32
        xa = np.zeros((1, Hb, Wb, 3), np.float32)
        xb = np.zeros((1, Hb, Wb, 3), np.float32)
        xa[0, : A.shape[0], : A.shape[1]] = A
        xb[0, : B.shape[0], : B.shape[1]] = B
        if self.params is None:
            self.params = self.net.init(jax.random.PRNGKey(0), jnp.asarray(xa), jnp.asarray(xb))
        warp, cert = self._fwd(self.params, jnp.asarray(xa), jnp.asarray(xb))
        warp = np.asarray(warp[0])  # (h4,w4,2) in B's /4 grid
        cert = np.asarray(cert[0])
        h4, w4 = warp.shape[:2]
        ys, xs = np.meshgrid(np.arange(h4), np.arange(w4), indexing="ij")
        kA = np.stack([xs * 4 + 1.5, ys * 4 + 1.5], -1).reshape(-1, 2)
        kB = (warp.reshape(-1, 2) * 4.0) + 1.5
        c = cert.reshape(-1)
        keep = (
            (c > self.conf["certainty_threshold"])
            & (kA[:, 0] < A.shape[1]) & (kA[:, 1] < A.shape[0])
            & (kB[:, 0] >= 0) & (kB[:, 0] < B.shape[1])
            & (kB[:, 1] >= 0) & (kB[:, 1] < B.shape[0])
        )
        idx = np.where(keep)[0]
        if len(idx) > self.conf["max_matches"]:
            idx = idx[np.argsort(-c[idx])[: self.conf["max_matches"]]]
        return {"keypoints0": kA[idx], "keypoints1": kB[idx], "certainty": c[idx]}
