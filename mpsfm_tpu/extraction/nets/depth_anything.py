"""DepthAnythingV2 — architecture-exact JAX port (DINOv2 + DPT head).

Replaces the reference's DepthAnythingV2 wrapper
(mpsfm/extraction/imagewise/geometry/models/depth/depthanything_v2.py,
which wraps the official Depth-Anything-V2 torch repo) with a TPU-native
forward: the DINOv2 ViT runs as fused einsum attention on the MXU, every
resize is a static separable interpolation matrix (one matmul per axis —
no gathers), and the whole model is one jitted program per input shape.

Parameters are kept under the OFFICIAL checkpoint names
(``pretrained.*`` for the DINOv2 backbone, ``depth_head.*`` for the DPT
decoder) so ``depth_anything_v2_vit{s,b,l}.pth`` state dicts load
directly; ``params_from_torch_state_dict`` also accepts HuggingFace
``DepthAnythingForDepthEstimation`` naming (used as the random-weight
parity oracle in tests/test_converters_dense.py).

Faithful details ported from the official repo:
  * pos-embed interpolation: bicubic (a=-0.75, torch's kernel) with the
    DINOv2 ``interpolate_offset=0.1`` scale convention,
  * LayerScale (ls1/ls2 gamma) residual scaling,
  * get_intermediate_layers(norm=True): the final LayerNorm applied to
    every hooked block output,
  * DPT fusion with explicit per-stage target sizes and
    align_corners=True bilinear upsampling,
  * relative (ReLU) vs metric (sigmoid * max_depth) output heads.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

MODEL_CONFIGS = {
    "vits": dict(dim=384, depth=12, heads=6, hooks=(2, 5, 8, 11),
                 features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(dim=768, depth=12, heads=12, hooks=(2, 5, 8, 11),
                 features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(dim=1024, depth=24, heads=16, hooks=(4, 11, 17, 23),
                 features=256, out_channels=(256, 512, 1024, 1024)),
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------- resizing
def _cubic_kernel(x, a=-0.75):
    """torch bicubic kernel (a=-0.75)."""
    x = np.abs(x)
    out = np.where(
        x <= 1, (a + 2) * x**3 - (a + 3) * x**2 + 1,
        np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
    )
    return out


def _interp_matrix(n_src, n_dst, mode="bilinear", align_corners=False, scale=None):
    """(n_dst, n_src) separable interpolation matrix replicating
    torch.nn.functional.interpolate's coordinate conventions. `scale`
    overrides the implied scale factor (DINOv2's +0.1 offset trick)."""
    W = np.zeros((n_dst, n_src), np.float64)
    if n_dst == 1 or n_src == 1:
        W[:] = 1.0 / n_src if not align_corners else 0.0
        if align_corners:
            W[:, 0] = 1.0
        return W
    if align_corners:
        src = np.arange(n_dst) * (n_src - 1) / (n_dst - 1)
    else:
        s = scale if scale is not None else n_dst / n_src
        src = (np.arange(n_dst) + 0.5) / s - 0.5
    if mode == "bilinear":
        lo = np.floor(src).astype(int)
        frac = src - lo
        for j in range(n_dst):
            i0 = min(max(lo[j], 0), n_src - 1)
            i1 = min(max(lo[j] + 1, 0), n_src - 1)
            W[j, i0] += 1 - frac[j]
            W[j, i1] += frac[j]
    else:  # bicubic
        base = np.floor(src).astype(int)
        for j in range(n_dst):
            for k in range(-1, 3):
                idx = base[j] + k
                w = _cubic_kernel(src[j] - idx)
                W[j, min(max(idx, 0), n_src - 1)] += w
    return W


def _resize(x, hw, mode="bilinear", align_corners=False, scales=None):
    """(B,H,W,C) -> (B,h,w,C) with static separable matrices (MXU matmuls)."""
    B, H, W0, C = x.shape
    h, w = hw
    if (H, W0) == (h, w):
        return x
    Wh = jnp.asarray(
        _interp_matrix(H, h, mode, align_corners, scales[0] if scales else None),
        x.dtype,
    )
    Ww = jnp.asarray(
        _interp_matrix(W0, w, mode, align_corners, scales[1] if scales else None),
        x.dtype,
    )
    return jnp.einsum("hH,bHWc,wW->bhwc", Wh, x, Ww)


# ---------------------------------------------------------------- primitives
def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _conv(x, w_oihw, b=None, stride=1, pad="SAME"):
    """NHWC conv with a torch-layout (O,I,kh,kw) kernel."""
    k = jnp.transpose(w_oihw, (2, 3, 1, 0))  # HWIO
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if b is None else y + b


def _deconv_block(x, w_iohw, b, f):
    """ConvTranspose2d with kernel==stride==f (pure pixel-expansion)."""
    B, h, w, _ = x.shape
    y = jnp.einsum("bhwc,copq->bhpwqo", x, w_iohw)  # (B,h,f,w,f,O)
    return y.reshape(B, h * f, w * f, w_iohw.shape[1]) + b


class DepthAnythingV2:
    """Functional DA2. Params: flat dict of official torch names -> jnp."""

    def __init__(self, conf=None):
        conf = dict(conf or {})
        enc = conf.get("encoder", "vitl")
        self.conf = {**MODEL_CONFIGS[enc], "encoder": enc,
                     "depth_estimation_type": conf.get("depth_estimation_type", "relative"),
                     "max_depth": conf.get("max_depth", 1.0),
                     "input_size": conf.get("input_size", 518),
                     **{k: v for k, v in conf.items() if k in MODEL_CONFIGS[enc]}}
        self.params = None
        wp = conf.get("weights_path")
        from mpsfm_tpu.extraction.weights import maybe_resolve

        wp = maybe_resolve(wp)
        if wp:
            import torch

            sd = torch.load(wp, map_location="cpu")
            if "state_dict" in sd:
                sd = sd["state_dict"]
            if "model" in sd:
                sd = sd["model"]
            # manifest check only at the official architecture size
            official = all(self.conf.get(k) == v for k, v in MODEL_CONFIGS[enc].items())
            if enc == "vitl" and official:
                from mpsfm_tpu.extraction.manifest import convert_checked

                self.params = convert_checked(
                    self.params_from_torch_state_dict, sd,
                    "depthanythingv2-vitl", where=str(wp),
                )
            else:
                self.params = self.params_from_torch_state_dict(sd)
        self._jit_fwd = jax.jit(self._forward, static_argnames=("patch_hw",))

    # ------------------------------------------------------------- params
    def init_random(self, seed=0):
        """Random params in the official naming (shapes only — used by
        throughput benches; parity tests convert real torch modules)."""
        rng = np.random.default_rng(seed)
        c = self.conf
        D, depth = c["dim"], c["depth"]
        p = {}

        def w(name, *shape, scale=0.02):
            p[name] = rng.normal(scale=scale, size=shape).astype(np.float32)

        def zeros(name, *shape):
            p[name] = np.zeros(shape, np.float32)

        def ones(name, *shape):
            p[name] = np.ones(shape, np.float32)

        w("pretrained.cls_token", 1, 1, D)
        grid = c["input_size"] // 14
        w("pretrained.pos_embed", 1, 1 + grid * grid, D)
        w("pretrained.patch_embed.proj.weight", D, 3, 14, 14)
        zeros("pretrained.patch_embed.proj.bias", D)
        for i in range(depth):
            b = f"pretrained.blocks.{i}."
            ones(b + "norm1.weight", D); zeros(b + "norm1.bias", D)
            ones(b + "norm2.weight", D); zeros(b + "norm2.bias", D)
            w(b + "attn.qkv.weight", 3 * D, D, scale=D**-0.5)
            zeros(b + "attn.qkv.bias", 3 * D)
            w(b + "attn.proj.weight", D, D, scale=D**-0.5)
            zeros(b + "attn.proj.bias", D)
            w(b + "mlp.fc1.weight", 4 * D, D, scale=D**-0.5)
            zeros(b + "mlp.fc1.bias", 4 * D)
            w(b + "mlp.fc2.weight", D, 4 * D, scale=D**-0.5)
            zeros(b + "mlp.fc2.bias", D)
            ones(b + "ls1.gamma", D)
            ones(b + "ls2.gamma", D)
        ones("pretrained.norm.weight", D); zeros("pretrained.norm.bias", D)
        oc, F = c["out_channels"], c["features"]
        for i in range(4):
            w(f"depth_head.projects.{i}.weight", oc[i], D, 1, 1, scale=D**-0.5)
            zeros(f"depth_head.projects.{i}.bias", oc[i])
            w(f"depth_head.scratch.layer{i+1}_rn.weight", F, oc[i], 3, 3, scale=0.05)
        w("depth_head.resize_layers.0.weight", oc[0], oc[0], 4, 4, scale=0.05)
        zeros("depth_head.resize_layers.0.bias", oc[0])
        w("depth_head.resize_layers.1.weight", oc[1], oc[1], 2, 2, scale=0.05)
        zeros("depth_head.resize_layers.1.bias", oc[1])
        w("depth_head.resize_layers.3.weight", oc[3], oc[3], 3, 3, scale=0.05)
        zeros("depth_head.resize_layers.3.bias", oc[3])
        for i in range(1, 5):
            rb = f"depth_head.scratch.refinenet{i}."
            for unit in ("resConfUnit1", "resConfUnit2"):
                w(rb + unit + ".conv1.weight", F, F, 3, 3, scale=0.05)
                zeros(rb + unit + ".conv1.bias", F)
                w(rb + unit + ".conv2.weight", F, F, 3, 3, scale=0.05)
                zeros(rb + unit + ".conv2.bias", F)
            w(rb + "out_conv.weight", F, F, 1, 1, scale=0.05)
            zeros(rb + "out_conv.bias", F)
        w("depth_head.scratch.output_conv1.weight", F // 2, F, 3, 3, scale=0.05)
        zeros("depth_head.scratch.output_conv1.bias", F // 2)
        w("depth_head.scratch.output_conv2.0.weight", 32, F // 2, 3, 3, scale=0.05)
        zeros("depth_head.scratch.output_conv2.0.bias", 32)
        w("depth_head.scratch.output_conv2.2.weight", 1, 32, 1, 1, scale=0.05)
        zeros("depth_head.scratch.output_conv2.2.bias", 1)
        self.params = jax.tree.map(jnp.asarray, p)

    def params_from_torch_state_dict(self, sd):
        """Official DA2 naming passes through; HF DepthAnything naming is
        renamed onto it (query/key/value fused back into qkv)."""
        sd = {k: np.asarray(v) for k, v in sd.items()}
        if any(k.startswith("backbone.") for k in sd):
            sd = self._rename_hf(sd)
        keep = {k: v for k, v in sd.items()
                if k.startswith(("pretrained.", "depth_head."))
                and "mask_token" not in k}
        return jax.tree.map(jnp.asarray, keep)

    @staticmethod
    def _rename_hf(sd):
        out = {}
        for k, v in sd.items():
            if k.startswith("backbone.embeddings.cls_token"):
                out["pretrained.cls_token"] = v
            elif k.startswith("backbone.embeddings.position_embeddings"):
                out["pretrained.pos_embed"] = v
            elif k.startswith("backbone.embeddings.patch_embeddings.projection"):
                out["pretrained.patch_embed.proj." + k.split(".")[-1]] = v
            elif k.startswith("backbone.layernorm."):
                out["pretrained.norm." + k.split(".")[-1]] = v
            elif k.startswith("backbone.encoder.layer."):
                parts = k.split(".")
                i, rest = parts[3], ".".join(parts[4:])
                b = f"pretrained.blocks.{i}."
                m = {
                    "norm1.weight": "norm1.weight", "norm1.bias": "norm1.bias",
                    "norm2.weight": "norm2.weight", "norm2.bias": "norm2.bias",
                    "attention.output.dense.weight": "attn.proj.weight",
                    "attention.output.dense.bias": "attn.proj.bias",
                    "layer_scale1.lambda1": "ls1.gamma",
                    "layer_scale2.lambda1": "ls2.gamma",
                    "mlp.fc1.weight": "mlp.fc1.weight", "mlp.fc1.bias": "mlp.fc1.bias",
                    "mlp.fc2.weight": "mlp.fc2.weight", "mlp.fc2.bias": "mlp.fc2.bias",
                }
                if rest in m:
                    out[b + m[rest]] = v
                else:
                    out.setdefault("_qkv", {}).setdefault(i, {})[rest] = v
            elif k.startswith("neck.reassemble_stage.layers."):
                parts = k.split(".")
                i, tail = parts[3], parts[-1]
                if parts[4] == "projection":
                    out[f"depth_head.projects.{i}.{tail}"] = v
                else:  # resize
                    out[f"depth_head.resize_layers.{i}.{tail}"] = v
            elif k.startswith("neck.convs."):
                i = int(k.split(".")[2])
                out[f"depth_head.scratch.layer{i+1}_rn.weight"] = v
            elif k.startswith("neck.fusion_stage.layers."):
                parts = k.split(".")
                # HF fuses reversed: layers.0 handles the COARSEST hook ->
                # official refinenet4
                i = 4 - int(parts[3])
                sub, tail = parts[4], parts[-1]
                m = {"residual_layer1": "resConfUnit1", "residual_layer2": "resConfUnit2",
                     "projection": "out_conv"}
                if sub == "projection":
                    out[f"depth_head.scratch.refinenet{i}.out_conv.{tail}"] = v
                else:
                    conv = "conv1" if parts[5] == "convolution1" else "conv2"
                    out[f"depth_head.scratch.refinenet{i}.{m[sub]}.{conv}.{tail}"] = v
            elif k.startswith("head.conv1."):
                out["depth_head.scratch.output_conv1." + k.split(".")[-1]] = v
            elif k.startswith("head.conv2."):
                out["depth_head.scratch.output_conv2.0." + k.split(".")[-1]] = v
            elif k.startswith("head.conv3."):
                out["depth_head.scratch.output_conv2.2." + k.split(".")[-1]] = v
        for i, qkv in out.pop("_qkv", {}).items():
            for tail in ("weight", "bias"):
                out[f"pretrained.blocks.{i}.attn.qkv.{tail}"] = np.concatenate(
                    [
                        qkv[f"attention.attention.query.{tail}"],
                        qkv[f"attention.attention.key.{tail}"],
                        qkv[f"attention.attention.value.{tail}"],
                    ],
                    axis=0,
                )
        return out

    # ------------------------------------------------------------- forward
    def _backbone(self, p, x, patch_hw):
        c = self.conf
        D, H, depth = c["dim"], c["heads"], c["depth"]
        h, w = patch_hw
        B = x.shape[0]
        Wp = jnp.transpose(p["pretrained.patch_embed.proj.weight"], (2, 3, 1, 0))
        xp = x.reshape(B, h, 14, w, 14, 3)
        tok = jnp.einsum("bhpwqc,pqcd->bhwd", xp, Wp).reshape(B, h * w, D)
        tok = tok + p["pretrained.patch_embed.proj.bias"]
        pe = p["pretrained.pos_embed"]  # (1, 1+M*M, D)
        M = int(math.isqrt(pe.shape[1] - 1))
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:].reshape(1, M, M, D)
        if (h, w) != (M, M):
            # DINOv2 interpolate_offset=0.1 bicubic convention
            patch_pe = _resize(
                patch_pe, (h, w), mode="bicubic",
                scales=((h + 0.1) / M, (w + 0.1) / M),
            )
        tok = tok + patch_pe.reshape(1, h * w, D)
        cls = jnp.broadcast_to(p["pretrained.cls_token"] + cls_pe, (B, 1, D))
        tok = jnp.concatenate([cls, tok], 1)

        hooks = set(c["hooks"])
        feats = []
        hd = D // H
        for i in range(depth):
            b = f"pretrained.blocks.{i}."
            y = _ln(tok, p[b + "norm1.weight"], p[b + "norm1.bias"])
            qkv = (jnp.einsum("bnd,ed->bne", y, p[b + "attn.qkv.weight"])
                   + p[b + "attn.qkv.bias"])
            qkv = qkv.reshape(B, -1, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5)
            a = jax.nn.softmax(a, -1)
            y = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, -1, D)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "attn.proj.weight"]) + p[b + "attn.proj.bias"]
            tok = tok + y * p[b + "ls1.gamma"]
            y = _ln(tok, p[b + "norm2.weight"], p[b + "norm2.bias"])
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc1.weight"]) + p[b + "mlp.fc1.bias"]
            y = jax.nn.gelu(y, approximate=False)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc2.weight"]) + p[b + "mlp.fc2.bias"]
            tok = tok + y * p[b + "ls2.gamma"]
            if i in hooks:
                feats.append(tok)
        return [
            _ln(f, p["pretrained.norm.weight"], p["pretrained.norm.bias"]) for f in feats
        ]

    def _forward(self, p, x, patch_hw):
        """x (B, 14h, 14w, 3) normalized -> depth (B, 14h, 14w)."""
        c = self.conf
        h, w = patch_hw
        B = x.shape[0]
        feats = self._backbone(p, x, patch_hw)
        oc, F = c["out_channels"], c["features"]
        pyr = []
        for i, f in enumerate(feats):
            y = f[:, 1:].reshape(B, h, w, c["dim"])
            Wproj = p[f"depth_head.projects.{i}.weight"][:, :, 0, 0]  # (O,I)
            y = jnp.einsum("bhwc,oc->bhwo", y, Wproj) + p[f"depth_head.projects.{i}.bias"]
            if i == 0:
                y = _deconv_block(y, p["depth_head.resize_layers.0.weight"],
                                  p["depth_head.resize_layers.0.bias"], 4)
            elif i == 1:
                y = _deconv_block(y, p["depth_head.resize_layers.1.weight"],
                                  p["depth_head.resize_layers.1.bias"], 2)
            elif i == 3:
                y = _conv(y, p["depth_head.resize_layers.3.weight"],
                          p["depth_head.resize_layers.3.bias"], stride=2)
            y = _conv(y, p[f"depth_head.scratch.layer{i+1}_rn.weight"])
            pyr.append(y)

        def rcu(prefix, x):
            y = jax.nn.relu(x)
            y = _conv(y, p[prefix + ".conv1.weight"], p[prefix + ".conv1.bias"])
            y = jax.nn.relu(y)
            y = _conv(y, p[prefix + ".conv2.weight"], p[prefix + ".conv2.bias"])
            return x + y

        def fuse(i, x, res, size):
            rb = f"depth_head.scratch.refinenet{i}"
            if res is not None:
                x = x + rcu(rb + ".resConfUnit1", res)
            x = rcu(rb + ".resConfUnit2", x)
            tgt = size if size else (x.shape[1] * 2, x.shape[2] * 2)
            x = _resize(x, tgt, align_corners=True)
            return _conv(x, p[rb + ".out_conv.weight"], p[rb + ".out_conv.bias"])

        path = fuse(4, pyr[3], None, pyr[2].shape[1:3])
        path = fuse(3, path, pyr[2], pyr[1].shape[1:3])
        path = fuse(2, path, pyr[1], pyr[0].shape[1:3])
        path = fuse(1, path, pyr[0], None)

        y = _conv(path, p["depth_head.scratch.output_conv1.weight"],
                  p["depth_head.scratch.output_conv1.bias"])
        y = _resize(y, (h * 14, w * 14), align_corners=True)
        y = _conv(y, p["depth_head.scratch.output_conv2.0.weight"],
                  p["depth_head.scratch.output_conv2.0.bias"])
        y = jax.nn.relu(y)
        y = _conv(y, p["depth_head.scratch.output_conv2.2.weight"],
                  p["depth_head.scratch.output_conv2.2.bias"])[..., 0]
        if c["depth_estimation_type"] == "metric":
            return jax.nn.sigmoid(y) * c["max_depth"]
        return jax.nn.relu(y)

    # ------------------------------------------------------------- host API
    def infer_image(self, image_rgb):
        """uint8/float HxWx3 -> depth at the input resolution (official
        preprocessing: resize so the short side is input_size, snapped to
        multiples of 14, ImageNet-normalize, forward, resize back)."""
        assert self.params is not None, "load weights or call init_random() first"
        img = np.asarray(image_rgb, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        H0, W0 = img.shape[:2]
        s = self.conf["input_size"] / min(H0, W0)
        h = max(int(round(H0 * s / 14)), 1) * 14
        w = max(int(round(W0 * s / 14)), 1) * 14
        x = jnp.asarray((img - IMAGENET_MEAN) / IMAGENET_STD)[None]
        x = _resize(x, (h, w))  # bilinear, torch convention
        d = self._jit_fwd(self.params, x, (h // 14, w // 14))
        d = _resize(d[..., None], (H0, W0))[0, ..., 0]
        return np.asarray(d)
