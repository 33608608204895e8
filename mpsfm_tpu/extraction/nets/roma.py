"""RoMa — architecture-exact JAX port (DINOv2 ViT-L/14 + VGG19 pyramid,
GP match encoder, transformer match decoder, ConvRefiner cascade).

Replaces the reference's RoMa wrapper
(mpsfm/extraction/pairwise/models/roma.py:26-124, which wraps the
official Parskatt/RoMa torch repo) with a TPU-native forward.

Parameter layout follows the official ``roma_outdoor.pth`` +
``dinov2_vitl14_pretrain.pth`` pair the reference downloads
(roma.py:40-45):

  dinov2.*                      the separate DINOv2 ViT-L/14 file's keys
      (cls_token/pos_embed/patch_embed/blocks.{i}/norm — frozen coarse
      encoder, final-layer patch tokens)
  encoder.cnn.layers.{i}.*      torchvision vgg19_bn features[:40] —
      fine pyramid at scales 1/2/4/8 (features recorded before each pool)
  decoder.embedding_decoder.blocks.{i}.* , .to_out.*
      5 DINOv2-style blocks (dim 1024 = gp 512 + feat 512, 8 heads,
      LayerScale) classifying each coarse token over a 64x64 anchor grid
      (+1 certainty channel)
  decoder.gps.16.pos_conv.*     GP module (cosine kernel, T=0.2,
      fourier basis positional embedding of the support grid)
  decoder.proj.{16,8,4,2,1}.{0,1}.*   conv1x1+BN feature projections
      (1024->512, 512->512, 256->256, 128->64, 64->9)
  decoder.conv_refiner.{16,8,4,2,1}.{block1,hidden_blocks.N,out_conv,disp_emb}.*
      depthwise 5x5 + BN + ReLU + 1x1 blocks refining the warp with
      warped-target features, displacement embeddings and local
      correlation volumes (radii 7/3/2/-/-)

The DINOv2/VGG encoder naming is checkpoint-exact; the decoder modules
follow the public romatch design under the documented names and are
parity-tested against a torch twin built in-test (tests/test_roma.py).
Matching semantics mirror the reference wrapper: dense mode = NMS on
certainty + to-pixel coords (roma.py:98-106), sparse mode = warp
endpoints assigned to detected keypoints <=2px (roma.py:107-117, served
through extraction's dense_anchor path).
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

# vgg19_bn features[:40]: ('C', ch) = conv3x3+BN+ReLU, 'M' = maxpool2
VGG19_SPEC = (
    ("C", 64), ("C", 64), "M",
    ("C", 128), ("C", 128), "M",
    ("C", 256), ("C", 256), ("C", 256), ("C", 256), "M",
    ("C", 512), ("C", 512), ("C", 512), ("C", 512), "M",
)

MODEL_CONFIG = dict(
    vit_dim=1024, vit_depth=24, vit_heads=16, vit_patch=14, pos_grid=37,
    gp_dim=512, feat_dim=512, dec_blocks=5, dec_heads=8,
    cls_res=64, kernel_T=0.2, sigma_noise=0.1,
    vgg_spec=VGG19_SPEC,
    # per-scale: (proj_in, proj_out, disp_emb_dim, local_corr_radius,
    #             hidden_blocks, dw)
    scales=(
        ("16", 1024, 512, 128, 7, 8, True),
        ("8", 512, 512, 64, 3, 8, True),
        ("4", 256, 256, 32, 2, 8, True),
        ("2", 128, 64, 16, 0, 8, True),
        ("1", 64, 9, 6, 0, 5, False),
    ),
    resolution=672,  # 14*8*6 (reference roma.py:74)
)


class RomaNet:
    """Functional RoMa. Params: flat dict of official names -> jnp."""

    def __init__(self, conf=None):
        conf = dict(conf or {})
        self.conf = {**MODEL_CONFIG, **{k: v for k, v in conf.items() if k in MODEL_CONFIG}}
        self.params = None
        wp = conf.get("weights_path")
        from mpsfm_tpu.extraction.weights import maybe_resolve

        wp = maybe_resolve(wp)
        if wp:
            import torch

            sd = torch.load(wp, map_location="cpu")
            for key in ("model", "state_dict"):
                if isinstance(sd, dict) and key in sd:
                    sd = sd[key]
            dv = maybe_resolve(conf.get("dinov2_weights_path"))
            dsd = {}
            if dv:
                dsd = torch.load(dv, map_location="cpu")
                if isinstance(dsd, dict) and "model" in dsd:
                    dsd = dsd["model"]
            # manifest check only at the official architecture size
            if self.conf == MODEL_CONFIG:
                from mpsfm_tpu.extraction.manifest import convert_checked

                # dinov2 ships as a separate file; require it when given
                name = "roma" if dv else "roma-outdoor"
                self.params = convert_checked(
                    lambda s: self.params_from_torch_state_dict(s, dsd),
                    sd, name, where=str(wp),
                )
            else:
                self.params = self.params_from_torch_state_dict(sd, dsd)
        self._jit_fwd = jax.jit(self._forward, static_argnames=("hw",))

    # ------------------------------------------------------------- params
    def params_from_torch_state_dict(self, sd, dinov2_sd=None, strict=True):
        out = {}
        unmatched = []
        for k, v in sd.items():
            if k.startswith("module."):
                k = k[len("module."):]
            if k.startswith(("encoder.", "decoder.")):
                if "num_batches_tracked" in k or "dinov2" in k:
                    continue
                out[k] = jnp.asarray(np.asarray(v))
            else:
                unmatched.append(k)
        for k, v in (dinov2_sd or {}).items():
            if "mask_token" in k:
                continue
            out["dinov2." + k] = jnp.asarray(np.asarray(v))
        if strict and unmatched:
            raise ValueError(f"unrecognized checkpoint keys: {unmatched[:8]}")
        return out

    def init_random(self, seed=0):
        rng = np.random.default_rng(seed)
        c = self.conf
        p = {}

        def w(name, *shape, scale=0.05):
            p[name] = rng.normal(scale=scale, size=shape).astype(np.float32)

        def zeros(name, *shape):
            p[name] = np.zeros(shape, np.float32)

        def ones(name, *shape):
            p[name] = np.ones(shape, np.float32)

        def bn(name, ch):
            ones(name + ".weight", ch)
            zeros(name + ".bias", ch)
            zeros(name + ".running_mean", ch)
            p[name + ".running_var"] = np.abs(
                rng.normal(loc=1.0, scale=0.1, size=ch)
            ).astype(np.float32)

        # ---- dinov2 (separate-file keys)
        D, depth = c["vit_dim"], c["vit_depth"]
        M = c["pos_grid"]
        w("dinov2.cls_token", 1, 1, D, scale=0.02)
        w("dinov2.pos_embed", 1, 1 + M * M, D, scale=0.02)
        w("dinov2.patch_embed.proj.weight", D, 3, c["vit_patch"], c["vit_patch"], scale=0.02)
        zeros("dinov2.patch_embed.proj.bias", D)
        for i in range(depth):
            b = f"dinov2.blocks.{i}."
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
        ones("dinov2.norm.weight", D); zeros("dinov2.norm.bias", D)

        # ---- vgg pyramid (torchvision vgg19_bn indexing)
        i = 0
        cin = 3
        for entry in c["vgg_spec"]:
            if entry == "M":
                i += 1
                continue
            _, ch = entry
            w(f"encoder.cnn.layers.{i}.weight", ch, cin, 3, 3)
            zeros(f"encoder.cnn.layers.{i}.bias", ch)
            bn(f"encoder.cnn.layers.{i+1}", ch)
            i += 3  # conv, bn, relu
            cin = ch

        # ---- embedding decoder (5 dinov2-style blocks + classifier)
        Dd = c["gp_dim"] + c["feat_dim"]
        for i in range(c["dec_blocks"]):
            b = f"decoder.embedding_decoder.blocks.{i}."
            ones(b + "norm1.weight", Dd); zeros(b + "norm1.bias", Dd)
            ones(b + "norm2.weight", Dd); zeros(b + "norm2.bias", Dd)
            w(b + "attn.qkv.weight", 3 * Dd, Dd, scale=Dd**-0.5)
            zeros(b + "attn.qkv.bias", 3 * Dd)
            w(b + "attn.proj.weight", Dd, Dd, scale=Dd**-0.5)
            zeros(b + "attn.proj.bias", Dd)
            w(b + "mlp.fc1.weight", 4 * Dd, Dd, scale=Dd**-0.5)
            zeros(b + "mlp.fc1.bias", 4 * Dd)
            w(b + "mlp.fc2.weight", Dd, 4 * Dd, scale=Dd**-0.5)
            zeros(b + "mlp.fc2.bias", Dd)
            ones(b + "ls1.gamma", Dd)
            ones(b + "ls2.gamma", Dd)
        K = c["cls_res"] ** 2
        w("decoder.embedding_decoder.to_out.weight", K + 1, Dd, scale=Dd**-0.5)
        zeros("decoder.embedding_decoder.to_out.bias", K + 1)

        # ---- GP positional embedding
        w("decoder.gps.16.pos_conv.weight", c["gp_dim"], 2, 1, 1)
        zeros("decoder.gps.16.pos_conv.bias", c["gp_dim"])

        # ---- projections + refiners
        for (s, cin_s, cout_s, demb, rad, hb, dw) in c["scales"]:
            w(f"decoder.proj.{s}.0.weight", cout_s, cin_s, 1, 1)
            zeros(f"decoder.proj.{s}.0.bias", cout_s)
            bn(f"decoder.proj.{s}.1", cout_s)
            corr_ch = (2 * rad + 1) ** 2 if rad else 0
            in_dim = 2 * cout_s + demb + corr_ch
            hid = in_dim if dw else max(in_dim, 24)
            rb = f"decoder.conv_refiner.{s}."
            w(rb + "disp_emb.weight", demb, 2, 1, 1)
            zeros(rb + "disp_emb.bias", demb)

            def refblock(prefix, ci, co, dw_):
                g = ci if dw_ else 1
                w(prefix + ".0.weight", co, ci // g, 5, 5)
                zeros(prefix + ".0.bias", co)
                bn(prefix + ".1", co)
                w(prefix + ".3.weight", co, co, 1, 1)
                zeros(prefix + ".3.bias", co)

            refblock(rb + "block1", in_dim, hid, dw)
            for k in range(hb):
                refblock(rb + f"hidden_blocks.{k}", hid, hid, dw)
            w(rb + "out_conv.weight", 3, hid, 1, 1)
            zeros(rb + "out_conv.bias", 3)
        self.params = jax.tree.map(jnp.asarray, p)
        return self.params

    # ------------------------------------------------------------ encoder
    @staticmethod
    def _bn(p, name, x):
        mean = p[name + ".running_mean"]
        var = p[name + ".running_var"]
        return (x - mean) / jnp.sqrt(var + 1e-5) * p[name + ".weight"] + p[name + ".bias"]

    def _vgg(self, p, x):
        """Features BEFORE each maxpool (romatch VGG19): scales 1,2,4,8."""
        feats = {}
        scale = 1
        i = 0
        for entry in self.conf["vgg_spec"]:
            if entry == "M":
                feats[scale] = x
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                scale *= 2
                i += 1
                continue
            x = _conv(x, p[f"encoder.cnn.layers.{i}.weight"], p[f"encoder.cnn.layers.{i}.bias"])
            x = self._bn(p, f"encoder.cnn.layers.{i+1}", x)
            x = jax.nn.relu(x)
            i += 3
        return feats

    def _dinov2(self, p, x, patch_hw):
        c = self.conf
        D, H, depth = c["vit_dim"], c["vit_heads"], c["vit_depth"]
        ps = c["vit_patch"]
        h, w = patch_hw
        B = x.shape[0]
        Wp = jnp.transpose(p["dinov2.patch_embed.proj.weight"], (2, 3, 1, 0))
        xp = x.reshape(B, h, ps, w, ps, 3)
        tok = jnp.einsum("bhpwqc,pqcd->bhwd", xp, Wp).reshape(B, h * w, D)
        tok = tok + p["dinov2.patch_embed.proj.bias"]
        pe = p["dinov2.pos_embed"]
        M = int(math.isqrt(pe.shape[1] - 1))
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:].reshape(1, M, M, D)
        if (h, w) != (M, M):
            patch_pe = _resize(patch_pe, (h, w), mode="bicubic",
                               scales=((h + 0.1) / M, (w + 0.1) / M))
        tok = tok + patch_pe.reshape(1, h * w, D)
        cls = jnp.broadcast_to(p["dinov2.cls_token"] + cls_pe, (B, 1, D))
        tok = jnp.concatenate([cls, tok], 1)
        hd = D // H
        for i in range(depth):
            b = f"dinov2.blocks.{i}."
            y = _ln(tok, p[b + "norm1.weight"], p[b + "norm1.bias"])
            qkv = (jnp.einsum("bnd,ed->bne", y, p[b + "attn.qkv.weight"])
                   + p[b + "attn.qkv.bias"]).reshape(B, -1, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5, -1)
            y = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, -1, D)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "attn.proj.weight"]) + p[b + "attn.proj.bias"]
            tok = tok + y * p[b + "ls1.gamma"]
            y = _ln(tok, p[b + "norm2.weight"], p[b + "norm2.bias"])
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc1.weight"]) + p[b + "mlp.fc1.bias"]
            y = jax.nn.gelu(y, approximate=False)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc2.weight"]) + p[b + "mlp.fc2.bias"]
            tok = tok + y * p[b + "ls2.gamma"]
        tok = _ln(tok, p["dinov2.norm.weight"], p["dinov2.norm.bias"])
        return tok[:, 1:].reshape(B, h, w, D)

    # ------------------------------------------------------------ decoder
    def _gp(self, p, xa, xb):
        """Cosine-kernel GP regression: posterior mean of xb's fourier
        position embedding at xa's features (romatch GP/CosKernel)."""
        c = self.conf
        B, h, w, C = xa.shape
        T = c["kernel_T"]
        ys = np.linspace(-1 + 1 / h, 1 - 1 / h, h)
        xs = np.linspace(-1 + 1 / w, 1 - 1 / w, w)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        coords = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)[None]  # (1,h,w,2)
        Wp = p["decoder.gps.16.pos_conv.weight"][:, :, 0, 0]
        f = jnp.einsum("bhwc,oc->bhwo", jnp.broadcast_to(coords, (B, h, w, 2)), Wp) \
            + p["decoder.gps.16.pos_conv.bias"]
        N = h * w
        a = xa.reshape(B, N, C)
        bt = xb.reshape(B, N, C)
        fv = f.reshape(B, N, -1)

        def cos_k(u, v):
            un = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-6)
            vn = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
            return jnp.exp((jnp.einsum("bnd,bmd->bnm", un, vn) - 1.0) / T)

        K_bb = cos_k(bt, bt) + c["sigma_noise"] * jnp.eye(N)
        K_ab = cos_k(a, bt)
        sol = jnp.linalg.solve(K_bb, fv)  # (B,N,gp)
        mu = jnp.einsum("bnm,bmd->bnd", K_ab, sol)
        return mu.reshape(B, h, w, -1)

    def _match_decoder(self, p, x):
        """5 transformer blocks + anchor-grid classifier -> (logits, cert)."""
        c = self.conf
        B, h, w, Dd = x.shape
        tok = x.reshape(B, h * w, Dd)
        H = c["dec_heads"]
        hd = Dd // H
        for i in range(c["dec_blocks"]):
            b = f"decoder.embedding_decoder.blocks.{i}."
            y = _ln(tok, p[b + "norm1.weight"], p[b + "norm1.bias"])
            qkv = (jnp.einsum("bnd,ed->bne", y, p[b + "attn.qkv.weight"])
                   + p[b + "attn.qkv.bias"]).reshape(B, -1, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5, -1)
            y = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, -1, Dd)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "attn.proj.weight"]) + p[b + "attn.proj.bias"]
            tok = tok + y * p[b + "ls1.gamma"]
            y = _ln(tok, p[b + "norm2.weight"], p[b + "norm2.bias"])
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc1.weight"]) + p[b + "mlp.fc1.bias"]
            y = jax.nn.gelu(y, approximate=False)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc2.weight"]) + p[b + "mlp.fc2.bias"]
            tok = tok + y * p[b + "ls2.gamma"]
        out = jnp.einsum("bnd,ed->bne", tok, p["decoder.embedding_decoder.to_out.weight"]) \
            + p["decoder.embedding_decoder.to_out.bias"]
        out = out.reshape(B, h, w, -1)
        return out[..., :-1], out[..., -1:]

    def _cls_to_flow(self, logits):
        """romatch cls_to_flow_refine: argmax anchor cell + 3x3-neighbor
        softmax-weighted refinement -> flow in [-1,1]² of image B."""
        c = self.conf
        R = c["cls_res"]
        B, h, w, K = logits.shape
        cell = jnp.argmax(logits, -1)  # (B,h,w)
        cy, cx = cell // R, cell % R
        offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        probs = []
        coords = []
        for dy, dx in offs:
            ny = jnp.clip(cy + dy, 0, R - 1)
            nx = jnp.clip(cx + dx, 0, R - 1)
            idx = ny * R + nx
            probs.append(jnp.take_along_axis(logits, idx[..., None], -1)[..., 0])
            coords.append(jnp.stack(
                [(nx + 0.5) / R * 2 - 1, (ny + 0.5) / R * 2 - 1], -1
            ))
        pr = jax.nn.softmax(jnp.stack(probs, -1), -1)  # (B,h,w,9)
        co = jnp.stack(coords, -2)  # (B,h,w,9,2)
        return (pr[..., None] * co).sum(-2)  # (B,h,w,2)

    @staticmethod
    def _grid_sample(img, flow):
        """Bilinear sample img (B,H,W,C) at flow (B,h,w,2) in [-1,1]
        (align_corners=False convention)."""
        B, H, W, C = img.shape
        x = (flow[..., 0] + 1) * W / 2 - 0.5
        y = (flow[..., 1] + 1) * H / 2 - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0

        def gather(yy, xx):
            # zero padding: each out-of-image corner contributes 0
            # (torch grid_sample padding_mode='zeros' semantics)
            valid = ((yy >= 0) & (yy < H) & (xx >= 0) & (xx < W))[..., None]
            yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            flat = img.reshape(B, H * W, C)
            idx = (yc * W + xc).reshape(B, -1)
            out = jnp.take_along_axis(flat, idx[..., None], 1)
            return out.reshape(B, *yy.shape[1:], C) * valid

        return (
            gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
            + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
            + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
            + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
        )

    def _local_corr(self, xa, xb, flow, radius):
        """(2r+1)² correlation channels between xa pixels and xb sampled
        around the current warp (romatch local_correlation)."""
        B, h, w, C = xa.shape
        chans = []
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                off = jnp.asarray([2 * dx / w, 2 * dy / h], jnp.float32)
                sb = self._grid_sample(xb, flow + off)
                chans.append((xa * sb).mean(-1) / math.sqrt(C))
        return jnp.stack(chans, -1)

    def _refiner(self, p, s, dw, hb, rad, xa, xb, flow):
        rb = f"decoder.conv_refiner.{s}."
        x_hat = self._grid_sample(xb, flow)
        B, h, w, _ = xa.shape
        ys = np.linspace(-1 + 1 / h, 1 - 1 / h, h)
        xs = np.linspace(-1 + 1 / w, 1 - 1 / w, w)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        grid = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)[None]
        disp = flow - grid
        Wd = p[rb + "disp_emb.weight"][:, :, 0, 0]
        demb = jnp.einsum("bhwc,oc->bhwo", disp * (40.0 / 32.0), Wd) + p[rb + "disp_emb.bias"]
        parts = [xa, x_hat, demb]
        if rad:
            parts.append(self._local_corr(xa, xb, flow, rad))
        d = jnp.concatenate(parts, -1)

        def refblock(prefix, x, dw_):
            cin = x.shape[-1]
            g = cin if dw_ else 1
            wgt = p[prefix + ".0.weight"]  # (O, I/g, 5, 5)
            k = jnp.transpose(wgt, (2, 3, 1, 0))
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
            )
            y = y + p[prefix + ".0.bias"]
            y = self._bn(p, prefix + ".1", y)
            y = jax.nn.relu(y)
            Wo = p[prefix + ".3.weight"][:, :, 0, 0]
            return jnp.einsum("bhwc,oc->bhwo", y, Wo) + p[prefix + ".3.bias"]

        d = refblock(rb + "block1", d, dw)
        for k in range(hb):
            d = refblock(rb + f"hidden_blocks.{k}", d, dw)
        Wo = p[rb + "out_conv.weight"][:, :, 0, 0]
        d = jnp.einsum("bhwc,oc->bhwo", d, Wo) + p[rb + "out_conv.bias"]
        return d[..., :2], d[..., 2:3]

    # ------------------------------------------------------------ forward
    def _forward(self, p, xa, xb, hw):
        """xa/xb (B,H,W,3) ImageNet-normalized, H=W=resolution. Returns
        (warp (B,H,W,2) in [-1,1] coords of B, certainty logits (B,H,W))."""
        c = self.conf
        H, W = hw
        ps = c["vit_patch"]
        both = jnp.concatenate([xa, xb], 0)
        B = xa.shape[0]
        vgg = self._vgg(p, both)
        coarse = self._dinov2(p, both, (H // ps, W // ps))

        def proj(s, x):
            Wk = p[f"decoder.proj.{s}.0.weight"][:, :, 0, 0]
            y = jnp.einsum("bhwc,oc->bhwo", x, Wk) + p[f"decoder.proj.{s}.0.bias"]
            return self._bn(p, f"decoder.proj.{s}.1", y)

        feats = {"16": proj("16", coarse)}
        for s, scale in (("8", 8), ("4", 4), ("2", 2), ("1", 1)):
            feats[s] = proj(s, vgg[scale])

        flow = None
        cert = None
        for (s, _cin, _cout, _demb, rad, hb, dw) in c["scales"]:
            fa = feats[s][:B]
            fb = feats[s][B:]
            h, w = fa.shape[1:3]
            if s == "16":
                gp = self._gp(p, fa, fb)
                logits, cert0 = self._match_decoder(p, jnp.concatenate([gp, fa], -1))
                flow = self._cls_to_flow(logits)
                cert = cert0
            else:
                flow = _resize(flow, (h, w))
                cert = _resize(cert, (h, w))
            disp, dcert = self._refiner(p, s, dw, hb, rad, fa, fb, flow)
            # displacement is predicted in pixel-ish units of this scale;
            # convert to the normalized [-1,1] warp (romatch ConvRefiner)
            flow = flow + disp * jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
            cert = cert + dcert
        return flow, cert[..., 0]


class RomaMatcher:
    """Dense-matcher interface around the EXACT RomaNet (drop-in where
    WarpMatcher is used): pair of images -> dense keypoint pairs +
    certainty via maxpool NMS on the certainty map (reference
    roma.py:98-106 simple_nms + sample_thresh) at the matcher's working
    resolution, mapped back to original pixel coords
    (to_pixel_coordinates). The sparse mode (warp endpoints assigned to
    detected keypoints, roma.py:107-117) is served through extraction's
    dense_anchor path, which consumes exactly this output."""

    default_conf = {
        "sample_thresh": 0.1,
        "nms_radius": 8,
        "max_matches": 4096,
        "resolution": 672,
        "weights_path": None,
        "dinov2_weights_path": None,
    }

    def __init__(self, conf=None):
        conf = {**self.default_conf, **(conf or {})}
        self.conf = conf
        self.net = RomaNet(conf)
        if self.net.params is None:
            if self.net.conf["vit_dim"] >= 512 and not conf.get("allow_random"):
                raise RuntimeError(
                    "RoMa matcher has no weights in this environment. Set "
                    "dense_matcher_conf.weights_path (roma_outdoor.pth) and "
                    "dinov2_weights_path (dinov2_vitl14_pretrain.pth); pass "
                    "allow_random: true for compile/throughput smokes."
                )
            self.net.init_random(0)  # tiny test configs / smoke paths

    def _prep(self, img, res):
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        H0, W0 = img.shape[:2]
        x = (img - IMAGENET_MEAN) / IMAGENET_STD
        x = np.asarray(_resize(jnp.asarray(x)[None], (res, res)))[0]
        return x, (H0, W0)

    def __call__(self, imgA, imgB):
        res = int(self.conf["resolution"])
        ps = self.net.conf["vit_patch"]
        res = (res // (ps * 16)) * ps * 16 or ps * 16  # /14 and /16 divisible
        A, shA = self._prep(imgA, res)
        Bm, shB = self._prep(imgB, res)
        warp, cert = self.net._jit_fwd(
            self.net.params, jnp.asarray(A)[None], jnp.asarray(Bm)[None], (res, res)
        )
        cert = jax.nn.sigmoid(cert[0])
        # maxpool NMS (reference simple_nms, models/utils/warp.py:6-24)
        r = int(self.conf["nms_radius"])
        pooled = jax.lax.reduce_window(
            cert, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
        )
        keep = np.asarray((cert == pooled) & (cert > self.conf["sample_thresh"]))
        warp = np.asarray(warp[0])
        cert = np.asarray(cert)
        ys, xs = np.where(keep)
        if len(ys) == 0:
            return {"keypoints0": np.zeros((0, 2)), "keypoints1": np.zeros((0, 2)),
                    "certainty": np.zeros(0)}
        score = cert[ys, xs]
        if len(ys) > self.conf["max_matches"]:
            sel = np.argsort(-score)[: self.conf["max_matches"]]
            ys, xs, score = ys[sel], xs[sel], score[sel]
        # to_pixel_coordinates (reference roma.py:101): A pixels from the
        # grid, B pixels from the warp ([-1,1] -> px of the ORIGINAL sizes)
        kA = np.stack([xs * shA[1] / res, ys * shA[0] / res], -1)
        wb = warp[ys, xs]
        kB = np.stack([(wb[:, 0] + 1) / 2 * shB[1], (wb[:, 1] + 1) / 2 * shB[0]], -1)
        ok = (kB[:, 0] >= 0) & (kB[:, 0] < shB[1]) & (kB[:, 1] >= 0) & (kB[:, 1] < shB[0])
        return {"keypoints0": kA[ok], "keypoints1": kB[ok], "certainty": score[ok]}
