"""Global-descriptor retrieval backends.

NetVLAD (reference: mpsfm/extraction/imagewise/features/models/netvlad.py
— VGG16 conv5 backbone + NetVLAD pooling + PCA whitening, Pitts30K
weights) ported as a functional JAX model with a torch/mat checkpoint
converter; plus the dependency-free grid-intensity descriptor used when
no weights are present.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, b, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


# VGG16 conv layers up to conv5_3 (names match torchvision indices).
_VGG_LAYOUT = [
    (64, False), (64, True), (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, False),  # conv5_1..5_3 no final pool
]


def vgg16_features(params, img):
    """img (B,H,W,3) in [0,1] RGB -> conv5_3 features (B,h,w,512).

    Matches the reference NetVLAD exactly (netvlad.py:118-141): input is
    scaled to 0-255 and the checkpoint's averageImage mean subtracted
    (std=1); torchvision children()[:-2] drops the final ReLU+pool, so
    conv5_3 output is NOT rectified."""
    mean = params.get("preproc_mean", jnp.zeros(3))
    x = img * 255.0 - mean
    last = len(_VGG_LAYOUT) - 1
    for i, (ch, pool) in enumerate(_VGG_LAYOUT):
        w, b = params[f"conv{i}"]["w"], params[f"conv{i}"]["b"]
        x = _conv(x, w, b)
        if i != last:
            x = jax.nn.relu(x)
        if pool:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return x


def netvlad_pool(params, feats):
    """NetVLAD aggregation: feats (B,h,w,D) -> (B, D*K).

    Mirrors the reference NetVLADLayer (netvlad.py:18-40): pre-normalize
    descriptors over D, bias-free soft assignment, residuals to centers,
    intra-normalization over D per cluster, flatten in (D,K) order (the
    checkpoint's whitening matrix expects d*K+k indexing)."""
    B, h, w, D = feats.shape
    x = feats.reshape(B, h * w, D)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    # soft assignment: conv 1x1 == dense (score_bias=False in the checkpoint)
    logits = jnp.einsum("bnd,kd->bnk", x, params["assign_w"])
    if "assign_b" in params:
        logits = logits + params["assign_b"]
    assign = jax.nn.softmax(logits, axis=-1)  # (B,N,K)
    centers = params["centers"]  # (K,D)
    resid = x[:, :, None, :] - centers[None, None]  # (B,N,K,D)
    vlad = jnp.einsum("bnk,bnkd->bkd", assign, resid)
    vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
    vlad = vlad.transpose(0, 2, 1).reshape(B, -1)  # (B, D*K), d-major
    return vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)


class NetVLAD:
    default_conf = {"weights_path": None, "whiten_dim": 4096, "resize_max": 640}

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}
        self.params = None
        wp = self.conf.get("weights_path")
        from mpsfm_tpu.extraction.weights import maybe_resolve

        wp = maybe_resolve(wp)
        if wp:
            self.params = self.load_weights(wp)
        self._fwd = jax.jit(self._forward)

    @staticmethod
    def load_weights(path):
        """Load the Pitts30K matconvnet .mat checkpoint (the reference's
        format, netvlad.py:73-121) or a torch state dict in the
        reference-wrapper naming (backbone.N / netvlad.score_proj,
        netvlad.centers / whiten), converting to the param tree."""
        if str(path).endswith(".mat"):
            return NetVLAD._load_mat(path)
        import torch

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: np.asarray(v) for k, v in sd.items()}
        from mpsfm_tpu.extraction.manifest import check_state_dict

        check_state_dict(sd, "netvlad", where=str(path))
        return NetVLAD.params_from_torch_state_dict(sd)

    @staticmethod
    def params_from_torch_state_dict(sd):
        """Reference-wrapper torch naming -> param tree (see the reference
        NetVLAD._init for the layer layout this mirrors)."""
        params = {}
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for i, ti in enumerate(conv_idx):
            w = np.asarray(sd[f"backbone.{ti}.weight"])  # (O,I,kh,kw)
            b = np.asarray(sd[f"backbone.{ti}.bias"])
            params[f"conv{i}"] = {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}
        # score_proj is a bias-free Conv1d with kernel (K, D, 1)
        params["assign_w"] = np.asarray(sd["netvlad.score_proj.weight"])[:, :, 0]
        if "netvlad.score_proj.bias" in sd:
            params["assign_b"] = np.asarray(sd["netvlad.score_proj.bias"])
        params["centers"] = np.asarray(sd["netvlad.centers"]).T  # (D,K) -> (K,D)
        if "whiten.weight" in sd:
            params["whiten_w"] = np.asarray(sd["whiten.weight"])  # (4096, D*K)
            params["whiten_b"] = np.asarray(sd["whiten.bias"])
        if "preproc_mean" in sd:
            params["preproc_mean"] = np.asarray(sd["preproc_mean"]).reshape(3)
        return jax.tree.map(jnp.asarray, params)

    @staticmethod
    def _load_mat(path):
        """Parse the matconvnet Pitts30K_struct.mat exactly like the
        reference (netvlad.py:73-121): conv weights SxSxIxO at layers
        0..28, NetVLAD assignment+centers at layer 30 (centers negated),
        whitening 1x1xINxOUT at layer 33, averageImage preprocessing."""
        from scipy.io import loadmat

        mat = loadmat(path, struct_as_record=False, squeeze_me=True)
        layers = mat["net"].layers
        params = {}
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for i, li in enumerate(conv_idx):
            w = np.asarray(layers[li].weights[0], np.float32)  # S,S,I,O
            b = np.asarray(layers[li].weights[1], np.float32).reshape(-1)
            if w.ndim == 3:  # first conv: S,S,O with I=3 squeezed is impossible; guard I=1
                w = w[:, :, None, :]
            params[f"conv{i}"] = {"w": w, "b": b}
        score_w = np.asarray(layers[30].weights[0], np.float32)  # (D,K)
        center_w = -np.asarray(layers[30].weights[1], np.float32)  # (D,K)
        params["assign_w"] = score_w.T  # (K,D)
        params["centers"] = center_w.T  # (K,D)
        w = np.asarray(layers[33].weights[0], np.float32)  # 1,1,IN,OUT
        b = np.asarray(layers[33].weights[1], np.float32).reshape(-1)
        params["whiten_w"] = w.reshape(w.shape[-2], w.shape[-1]).T  # (OUT,IN)
        params["whiten_b"] = b
        avg = np.asarray(mat["net"].meta.normalization.averageImage, np.float32)
        params["preproc_mean"] = avg.reshape(-1)[:3]
        return jax.tree.map(jnp.asarray, params)

    def init_random(self, seed=0, K=64, D=512):
        rng = np.random.default_rng(seed)
        params = {}
        c_in = 3
        for i, (ch, _) in enumerate(_VGG_LAYOUT):
            params[f"conv{i}"] = {
                "w": rng.normal(scale=0.05, size=(3, 3, c_in, ch)).astype(np.float32),
                "b": np.zeros(ch, np.float32),
            }
            c_in = ch
        params["assign_w"] = rng.normal(scale=0.1, size=(K, D)).astype(np.float32)
        params["assign_b"] = np.zeros(K, np.float32)
        params["centers"] = rng.normal(size=(K, D)).astype(np.float32)
        self.params = jax.tree.map(jnp.asarray, params)

    def _forward(self, params, img):
        feats = vgg16_features(params, img)
        v = netvlad_pool(params, feats)
        if "whiten_w" in params:
            v = jnp.einsum("bd,od->bo", v, params["whiten_w"]) + params["whiten_b"]
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return v

    def __call__(self, image_rgb: np.ndarray):
        assert self.params is not None, "load weights or init_random() first"
        import cv2

        img = image_rgb.astype(np.float32) / 255.0 if image_rgb.dtype == np.uint8 else image_rgb
        m = self.conf["resize_max"]
        if m and max(img.shape[:2]) > m:
            s = m / max(img.shape[:2])
            img = cv2.resize(img, (int(img.shape[1] * s), int(img.shape[0] * s)))
        # pad to /32 for the 5 pools
        H, W = img.shape[:2]
        H32, W32 = ((H + 31) // 32) * 32, ((W + 31) // 32) * 32
        buf = np.zeros((H32, W32, 3), np.float32)
        buf[:H, :W] = img
        return np.asarray(self._fwd(self.params, jnp.asarray(buf)[None]))[0]
