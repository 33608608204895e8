"""DepthPro — architecture-exact JAX port (Apple's metric mono-depth).

Replaces the reference's DepthPro wrapper
(mpsfm/extraction/imagewise/geometry/models/depth/depthpro.py, which
wraps apple/ml-depth-pro) with a TPU-native forward. The model runs a
DINOv2 ViT over a 3-level image pyramid of overlapping fixed-size
patches — on TPU all 35 patches are ONE batched ViT forward through the
MXU — plus a full-image encoder and an optional FOV head, then fuses
the merged multi-scale feature maps through a DPT-style decoder to a
canonical-inverse-depth map and a field-of-view estimate (metric depth
= f_px-corrected inverse depth, as in the paper).

Parameters use the HuggingFace ``DepthProForDepthEstimation`` naming
(apple/DepthPro-hf — the published conversion of the official
checkpoint); the HF torch implementation doubles as the random-weight
parity oracle in tests/test_converters_dense.py. Every resize is a
static separable interpolation matrix and the overlapping patch
split/merge is static slicing — no dynamic shapes anywhere.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.extraction.nets.depth_anything import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _conv,
    _ln,
    _resize,
)


def _torch_int(x):
    return int(x)  # torch_int truncates toward zero (positive here)


class DepthPro:
    """Functional DepthPro; flat HF-named param dict."""

    default_conf = {
        # ViT config shared by patch/image/fov encoders (apple: ViT-L/14@384)
        "dim": 1024,
        "depth": 24,
        "heads": 16,
        "vit_image_size": 384,
        "vit_patch": 14,
        # multi-scale pyramid
        "patch_size": 384,
        "scaled_images_ratios": (0.25, 0.5, 1.0),
        "scaled_images_overlap_ratios": (0.0, 0.5, 0.25),
        "scaled_images_feature_dims": (1024, 1024, 512),
        "intermediate_hook_ids": (11, 5),
        "intermediate_feature_dims": (256, 256),
        "merge_padding_value": 3,
        "fusion_hidden_size": 256,
        "use_fov_model": True,
        "num_fov_head_layers": 2,
        "image_size": 1536,  # network input resolution
    }

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}
        self.params = None
        wp = self.conf.get("weights_path")
        from mpsfm_tpu.extraction.weights import maybe_resolve

        wp = maybe_resolve(wp)
        if wp:
            import torch

            sd = torch.load(wp, map_location="cpu")
            if "state_dict" in sd:
                sd = sd["state_dict"]
            # manifest check only at the official architecture size
            if all(self.conf.get(k) == v for k, v in self.default_conf.items()
                   if k != "weights_path"):
                from mpsfm_tpu.extraction.manifest import check_state_dict

                check_state_dict(sd, "depthpro", where=str(wp))
            self.params = self.params_from_torch_state_dict(sd)
        self._jit_fwd = jax.jit(self._forward)

    # ------------------------------------------------------------- params
    def params_from_torch_state_dict(self, sd):
        keep = {
            k: jnp.asarray(np.asarray(v))
            for k, v in sd.items()
            if "mask_token" not in k and "num_batches_tracked" not in k
        }
        return keep

    def init_random(self, seed=0):
        """Random params with HF naming — via an actual HF torch module
        when available (tests), else direct shape construction."""
        import torch
        from transformers import DepthProConfig, DepthProForDepthEstimation, Dinov2Config

        c = self.conf
        vit = dict(
            hidden_size=c["dim"], num_hidden_layers=c["depth"],
            num_attention_heads=c["heads"], intermediate_size=4 * c["dim"],
            image_size=c["vit_image_size"], patch_size=c["vit_patch"],
        )
        cfg = DepthProConfig(
            image_model_config=Dinov2Config(**vit),
            patch_model_config=Dinov2Config(**vit),
            fov_model_config=Dinov2Config(**vit),
            patch_size=c["patch_size"],
            scaled_images_ratios=list(c["scaled_images_ratios"]),
            scaled_images_overlap_ratios=list(c["scaled_images_overlap_ratios"]),
            scaled_images_feature_dims=list(c["scaled_images_feature_dims"]),
            intermediate_hook_ids=list(c["intermediate_hook_ids"]),
            intermediate_feature_dims=list(c["intermediate_feature_dims"]),
            merge_padding_value=c["merge_padding_value"],
            fusion_hidden_size=c["fusion_hidden_size"],
            use_fov_model=c["use_fov_model"],
            num_fov_head_layers=c["num_fov_head_layers"],
        )
        torch.manual_seed(seed)
        tmodel = DepthProForDepthEstimation(cfg, use_fov_model=c["use_fov_model"])
        with torch.no_grad():
            for q in tmodel.parameters():
                q.copy_(torch.randn_like(q) * 0.05)
        self.params = self.params_from_torch_state_dict(
            {k: v.numpy() for k, v in tmodel.state_dict().items()}
        )
        return tmodel

    # ------------------------------------------------------------- dinov2
    def _vit_all_layers(self, p, prefix, x):
        """HF Dinov2Model forward on (B, S, S, 3); returns the raw hidden
        states after every block (index 0 = embeddings) plus the
        final-layernormed last state. No pos-embed interpolation needed:
        DepthPro always feeds exactly vit_image_size inputs."""
        c = self.conf
        D, H, depth = c["dim"], c["heads"], c["depth"]
        P = c["vit_patch"]
        B, S = x.shape[0], x.shape[1]
        h = w = S // P
        Wp = jnp.transpose(p[prefix + "embeddings.patch_embeddings.projection.weight"], (2, 3, 1, 0))
        # HF Dinov2 patchifies with a VALID conv: 384 px / patch 14 ->
        # 27 tokens, silently dropping the trailing 6 px — crop to match
        xp = x[:, : h * P, : w * P].reshape(B, h, P, w, P, 3)
        tok = jnp.einsum("bhpwqc,pqcd->bhwd", xp, Wp).reshape(B, h * w, D)
        tok = tok + p[prefix + "embeddings.patch_embeddings.projection.bias"]
        pe = p[prefix + "embeddings.position_embeddings"]
        M = int(math.isqrt(pe.shape[1] - 1))
        assert (h, w) == (M, M), "DepthPro ViTs always run at native size"
        cls = jnp.broadcast_to(p[prefix + "embeddings.cls_token"], (B, 1, D))
        tok = jnp.concatenate([cls, tok], 1) + pe

        states = [tok]
        hd = D // H
        for i in range(depth):
            b = f"{prefix}encoder.layer.{i}."
            y = _ln(tok, p[b + "norm1.weight"], p[b + "norm1.bias"])
            q = jnp.einsum("bnd,ed->bne", y, p[b + "attention.attention.query.weight"]) + p[b + "attention.attention.query.bias"]
            k = jnp.einsum("bnd,ed->bne", y, p[b + "attention.attention.key.weight"]) + p[b + "attention.attention.key.bias"]
            v = jnp.einsum("bnd,ed->bne", y, p[b + "attention.attention.value.weight"]) + p[b + "attention.attention.value.bias"]
            q, k, v = (t.reshape(B, -1, H, hd) for t in (q, k, v))
            a = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5), -1)
            y = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, -1, D)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "attention.output.dense.weight"]) + p[b + "attention.output.dense.bias"]
            tok = tok + y * p[b + "layer_scale1.lambda1"]
            y = _ln(tok, p[b + "norm2.weight"], p[b + "norm2.bias"])
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc1.weight"]) + p[b + "mlp.fc1.bias"]
            y = jax.nn.gelu(y, approximate=False)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc2.weight"]) + p[b + "mlp.fc2.bias"]
            tok = tok + y * p[b + "layer_scale2.lambda1"]
            states.append(tok)
        final = _ln(states[-1], p[prefix + "layernorm.weight"], p[prefix + "layernorm.bias"])
        return states, final

    # ---------------------------------------------------------- patching
    @staticmethod
    def _split_to_patches(x, patch, overlap):
        """(B,H,W,C) -> (n_patches*B, patch, patch, C), torch-unfold order
        (row-major patch grid, patch index major over batch)."""
        B, H, W, C = x.shape
        if H == W == patch:
            return x
        stride = _torch_int(patch * (1 - overlap))
        out = []
        for i in range(0, H - patch + 1, stride):
            for j in range(0, W - patch + 1, stride):
                out.append(x[:, i : i + patch, j : j + patch, :])
        return jnp.concatenate(out, 0)

    @staticmethod
    def _merge_patches(patches, batch_size, padding):
        """Inverse of _split_to_patches on feature maps (B-major blocks),
        cropping `padding` pixels from interior merge edges."""
        n, h, w, C = patches.shape
        npb = n // batch_size
        if n == batch_size:
            return patches
        s = int(math.isqrt(npb))
        rows = []
        i = 0
        for r in range(s):
            cols = []
            for c in range(s):
                box = patches[batch_size * i : batch_size * (i + 1)]
                top = padding if r != 0 else 0
                bot = padding if r != s - 1 else 0
                left = padding if c != 0 else 0
                right = padding if c != s - 1 else 0
                cols.append(box[:, top : h - bot, left : w - right, :])
                i += 1
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)

    def _reconstruct(self, tokens, batch_size, padding, out_hw):
        """(n*B, 1+S²,D) tokens -> (B, out_h, out_w, D) feature map."""
        n, seq, D = tokens.shape
        size = int(math.isqrt(seq))
        feats = tokens[:, -(size * size) :, :].reshape(n, size, size, D)
        feats = self._merge_patches(feats, batch_size, padding)
        return _resize(feats, out_hw)

    # ------------------------------------------------------------ forward
    def _forward(self, p, x):
        """x (B, image_size, image_size, 3) normalized ->
        (inverse_depth (B,S,S), fov_deg (B,) or None)."""
        c = self.conf
        B, S = x.shape[0], x.shape[1]
        ratios = c["scaled_images_ratios"]
        patch = c["patch_size"]
        out_size = c["vit_image_size"] // c["vit_patch"]
        n_scaled = len(ratios)

        # ---- patch encoder over the pyramid (one batched ViT forward)
        scaled = [
            self._split_to_patches(
                _resize(x, (int(S * r), int(S * r))), patch, c["scaled_images_overlap_ratios"][i]
            )
            for i, r in enumerate(ratios)
        ]
        n_per = [t.shape[0] for t in scaled]
        patches = jnp.concatenate(scaled[::-1], 0)  # high-res first
        hook_ids = c["intermediate_hook_ids"]
        states, final = self._vit_all_layers(p, "depth_pro.encoder.patch_encoder.model.", patches)
        splits = np.cumsum(n_per[::-1])[:-1]
        per_scale_last = jnp.split(final, splits, axis=0)[::-1]  # low-res first

        exponent = _torch_int(math.log2(S / out_size))
        base = S // 2**exponent
        feats = []
        for i in range(n_scaled):
            pad = _torch_int(c["merge_padding_value"] / ratios[i])
            feats.append(
                self._reconstruct(per_scale_last[i], B, pad, (base * 2**i, base * 2**i))
            )
        inter = []
        for hid in hook_ids:
            hs = states[hid + 1]
            # intermediate hooks use only the SCALE-1 patches (the first
            # n_per[-1] rows — high-res first in the batch)
            hs = hs[: n_per[-1] * 1]
            pad = _torch_int(c["merge_padding_value"] / ratios[-1])
            side = base * 2 ** (n_scaled - 1)
            inter.append(self._reconstruct(hs, B, pad, (side, side)))

        # ---- image encoder (whole image at ViT size)
        img = _resize(x, (c["vit_image_size"], c["vit_image_size"]))
        _, img_final = self._vit_all_layers(p, "depth_pro.encoder.image_encoder.model.", img)
        image_features = self._reconstruct(img_final, B, 0, (base, base))

        features = [image_features, *feats, *inter]

        # ---- neck: upsample + fuse image with low-res + project
        def deconv(t, w, b=None):
            B_, h_, w_, _ = t.shape
            y = jnp.einsum("bhwc,copq->bhpwqo", t, w)
            y = y.reshape(B_, h_ * 2, w_ * 2, w.shape[1])
            return y if b is None else y + b

        nk = "depth_pro.neck.feature_upsample."
        features[0] = deconv(
            features[0], p[nk + "image_block.layers.0.weight"], p[nk + "image_block.layers.0.bias"]
        )
        for i in range(n_scaled):
            blk = f"{nk}scaled_images.{i}.layers."
            y = jnp.einsum(
                "bhwc,oc->bhwo", features[i + 1], p[blk + "0.weight"][:, :, 0, 0]
            )
            features[i + 1] = deconv(y, p[blk + "1.weight"])
        for i in range(len(hook_ids)):
            blk = f"{nk}intermediate.{i}.layers."
            y = jnp.einsum(
                "bhwc,oc->bhwo", features[n_scaled + i + 1], p[blk + "0.weight"][:, :, 0, 0]
            )
            for j in range(1, 2 + i + 1):
                y = deconv(y, p[blk + f"{j}.weight"])
            features[n_scaled + i + 1] = y

        glob = jnp.concatenate([features[1], features[0]], -1)
        glob = _conv(glob, p["depth_pro.neck.fuse_image_with_low_res.weight"],
                     p["depth_pro.neck.fuse_image_with_low_res.bias"])
        features = [glob, *features[2:]]
        projected = []
        for i, f in enumerate(features):
            key = f"depth_pro.neck.feature_projection.projections.{i}.weight"
            projected.append(_conv(f, p[key]) if key in p else f)

        # ---- DPT fusion (coarse -> fine), deconv upsampling per stage
        F_ = c["fusion_hidden_size"]

        def rcu(prefix, t):
            y = jax.nn.relu(t)
            y = _conv(y, p[prefix + ".convolution1.weight"], p[prefix + ".convolution1.bias"])
            y = jax.nn.relu(y)
            y = _conv(y, p[prefix + ".convolution2.weight"], p[prefix + ".convolution2.bias"])
            return t + y

        fused = None
        n_layers = len(projected)
        for i, f in enumerate(projected):
            last = i == n_layers - 1
            pref = ("fusion_stage.final" if last else f"fusion_stage.intermediate.{i}")
            if fused is None:
                y = f
            else:
                y = fused + rcu(pref + ".residual_layer1", f)
            y = rcu(pref + ".residual_layer2", y)
            if not last:
                y = deconv(y, p[pref + ".deconv.weight"])
            fused = _conv(y, p[pref + ".projection.weight"], p[pref + ".projection.bias"])

        # ---- depth head
        y = _conv(fused, p["head.layers.0.weight"], p["head.layers.0.bias"])
        y = deconv(y, p["head.layers.1.weight"], p["head.layers.1.bias"])
        y = _conv(y, p["head.layers.2.weight"], p["head.layers.2.bias"])
        y = jax.nn.relu(y)
        y = _conv(y, p["head.layers.4.weight"], p["head.layers.4.bias"])
        inv_depth = jax.nn.relu(y)[..., 0]

        # ---- FOV head
        fov = None
        if c["use_fov_model"] and "fov_model.conv.weight" in p:
            _, fov_final = self._vit_all_layers(p, "fov_model.fov_encoder.model.", img)
            fov_tokens = jnp.einsum(
                "bnd,ed->bne", fov_final, p["fov_model.fov_encoder.neck.weight"]
            ) + p["fov_model.fov_encoder.neck.bias"]
            fov_feat = self._reconstruct(fov_tokens, B, 0, (base, base))
            gf = _conv(projected[0], p["fov_model.conv.weight"], p["fov_model.conv.bias"], stride=2)
            gf = jax.nn.relu(gf)
            y = fov_feat + gf
            y = _resize(y, (out_size, out_size))
            for i in range(c["num_fov_head_layers"]):
                y = _conv(y, p[f"fov_model.head.layers.{2*i}.weight"],
                          p[f"fov_model.head.layers.{2*i}.bias"], stride=2)
                y = jax.nn.relu(y)
            kw = p[f"fov_model.head.layers.{2*c['num_fov_head_layers']}.weight"]
            y = _conv(y, kw, p[f"fov_model.head.layers.{2*c['num_fov_head_layers']}.bias"],
                      pad="VALID")
            fov = y.reshape(B)
        return inv_depth, fov

    # ------------------------------------------------------------ host API
    def infer_image(self, image_rgb, f_px=None):
        """uint8/float HxWx3 -> dict(depth [m], fov_deg). Metric depth via
        the paper's canonical inverse-depth: depth = (W / f_px) / inv_depth
        with f_px from intrinsics or the FOV head."""
        assert self.params is not None, "load weights or call init_random() first"
        img = np.asarray(image_rgb, np.float32)
        if img.max() > 2.0:
            img = img / 255.0
        H0, W0 = img.shape[:2]
        S = self.conf["image_size"]
        x = jnp.asarray((img - IMAGENET_MEAN) / IMAGENET_STD)[None]
        x = _resize(x, (S, S))
        inv_c, fov = self._jit_fwd(self.params, x)
        inv_c = _resize(inv_c[..., None], (H0, W0))[0, ..., 0]
        fov_deg = float(np.asarray(fov)[0]) if fov is not None else None
        if f_px is None:
            if fov_deg is None:
                f_px = 0.5 * W0  # fallback: ~90 deg
            else:
                f_px = 0.5 * W0 / math.tan(0.5 * math.radians(fov_deg))
        inv = np.asarray(inv_c) * (W0 / f_px)
        depth = 1.0 / np.clip(inv, 1e-4, 1e4)
        return {"depth": depth, "fov_deg": fov_deg, "f_px": f_px}
