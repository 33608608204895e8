"""MASt3R — architecture-exact JAX port (CroCo ViT-L + RoPE, dual decoder,
DPT pointmap head + catMLP local-feature head).

Replaces the reference's Mast3rMatcher wrapper
(mpsfm/extraction/pairwise/models/mast3r.py:209-316, which wraps the
official naver/mast3r torch repo) with a TPU-native forward: both images
encode in one batch, both decode directions run through the asymmetric
dec_blocks/dec_blocks2 stacks, attention is fused einsum on the MXU with
2-D rotary embeddings computed as static tables, and reciprocal-NN
matching stays on device.

Parameters are kept under the OFFICIAL checkpoint layout of
``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth``:

  patch_embed.proj.*                    16x16 conv, 3 -> 1024
  enc_blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
                                        24 CroCo blocks, dim 1024, 16
                                        heads, RoPE2D(freq=100) on q/k
  enc_norm.*
  decoder_embed.*                       1024 -> 768
  dec_blocks.{i}.* / dec_blocks2.{i}.*  12 decoder blocks each (view 1 /
      view 2), dim 768, 12 heads: norm1 + self-attn, norm_y on the other
      view's tokens, norm2 + cross_attn.{projq,projk,projv,proj}, norm3 +
      mlp — the CroCo DecoderBlock layout
  dec_norm.*
  downstream_head{1,2}.dpt.*            DPT adapter: act_postprocess.{0-3}
      (1x1 proj + resize convs), scratch.layer{1-4}_rn,
      scratch.refinenet{1-4}.{resConfUnit1,resConfUnit2,out_conv}, head.{0,2,4}
  downstream_head{1,2}.head_local_features.{fc1,fc2}
                                        MLP on cat(enc, dec) tokens ->
                                        (desc_dim+1)*patch² channels,
                                        pixel-shuffled to full res

The encoder/decoder naming is checkpoint-exact (CroCo/DUSt3R is public
and stable); the head module names follow the public
catmlp_dpt_head/dpt_head design and are parity-tested against a torch
twin built in-test (tests/test_mast3r.py). Output semantics follow the
published postprocess: pts3d = unit(xyz)·expm1(|xyz|) (directional exp),
conf = 1 + exp(x), desc L2-normalized, desc_conf = exp-regularized —
head2's pointmap lives in view-1's frame (the DUSt3R convention the
reference's depth mode consumes, mast3r.py:303-315).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mpsfm_tpu.extraction.nets.depth_anything import _conv, _ln, _resize

DUST3R_MEAN = 0.5  # dust3r ImgNorm: Normalize((0.5,)*3, (0.5,)*3)
DUST3R_STD = 0.5

MODEL_CONFIG = dict(
    enc_dim=1024, enc_depth=24, enc_heads=16,
    dec_dim=768, dec_depth=12, dec_heads=12,
    patch=16, desc_dim=24, rope_freq=100.0,
    dpt_layer_dims=(96, 192, 384, 768), dpt_feature_dim=256,
    mlp_hidden_factor=4.0,
)


# ------------------------------------------------------------------ RoPE
def rope_tables(h, w, hd, freq=100.0):
    """cos/sin tables for CroCo RoPE2D: head dim split in (y, x) halves,
    each rotated GPT-NeoX style (rotate-half over its D/2 sub-dim)."""
    D = hd // 2  # per-coordinate sub-dim
    inv = 1.0 / (freq ** (np.arange(0, D, 2, dtype=np.float64) / D))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], -1)  # (N,2)

    def tab(p1d):
        f = np.einsum("n,k->nk", p1d.astype(np.float64), inv)  # (N,D/2)
        f = np.concatenate([f, f], -1)  # (N,D)
        return np.cos(f), np.sin(f)

    cy, sy = tab(pos[:, 0])
    cx, sx = tab(pos[:, 1])
    return (jnp.asarray(np.stack([cy, cx]), jnp.float32),
            jnp.asarray(np.stack([sy, sx]), jnp.float32))


def apply_rope(t, cos, sin):
    """t (B,N,H,hd); cos/sin (2,N,hd/2) for the (y, x) halves."""
    hd = t.shape[-1]
    D = hd // 2
    ty, tx = t[..., :D], t[..., D:]

    def rot(u, c, s):
        c = c[None, :, None, :]
        s = s[None, :, None, :]
        u1, u2 = u[..., : D // 2], u[..., D // 2:]
        ru = jnp.concatenate([-u2, u1], -1)
        return u * c + ru * s

    return jnp.concatenate([rot(ty, cos[0], sin[0]), rot(tx, cos[1], sin[1])], -1)


class Mast3rNet:
    """Functional MASt3R. Params: flat dict of official names -> jnp."""

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
            # manifest check only at the official architecture size
            if self.conf == MODEL_CONFIG:
                from mpsfm_tpu.extraction.manifest import convert_checked

                self.params = convert_checked(
                    self.params_from_torch_state_dict, sd, "mast3r", where=str(wp)
                )
            else:
                self.params = self.params_from_torch_state_dict(sd)
        self._jit_fwd = jax.jit(self._forward, static_argnames=("patch_hw",))

    # ------------------------------------------------------------- params
    def params_from_torch_state_dict(self, sd, strict=True):
        out = {}
        unmatched = []
        prefixes = ("patch_embed.", "enc_blocks.", "enc_norm.", "decoder_embed.",
                    "dec_blocks.", "dec_blocks2.", "dec_norm.", "downstream_head1.",
                    "downstream_head2.")
        for k, v in sd.items():
            if k.startswith("module."):
                k = k[len("module."):]
            if k.startswith(prefixes):
                out[k] = jnp.asarray(np.asarray(v))
            elif "mask_token" in k or k.startswith(("prediction_head", "mask_generator")):
                continue
            else:
                unmatched.append(k)
        if strict and unmatched:
            raise ValueError(f"unrecognized checkpoint keys: {unmatched[:8]}")
        return out

    def init_random(self, seed=0):
        rng = np.random.default_rng(seed)
        c = self.conf
        De, Dd = c["enc_dim"], c["dec_dim"]
        ps, dd = c["patch"], c["desc_dim"]
        p = {}

        def w(name, *shape, scale=0.02):
            p[name] = rng.normal(scale=scale, size=shape).astype(np.float32)

        def zeros(name, *shape):
            p[name] = np.zeros(shape, np.float32)

        def ones(name, *shape):
            p[name] = np.ones(shape, np.float32)

        def block(b, D, cross):
            ones(b + "norm1.weight", D); zeros(b + "norm1.bias", D)
            w(b + "attn.qkv.weight", 3 * D, D, scale=D**-0.5)
            zeros(b + "attn.qkv.bias", 3 * D)
            w(b + "attn.proj.weight", D, D, scale=D**-0.5)
            zeros(b + "attn.proj.bias", D)
            ones(b + "norm2.weight", D); zeros(b + "norm2.bias", D)
            if cross:
                ones(b + "norm_y.weight", D); zeros(b + "norm_y.bias", D)
                for nm in ("projq", "projk", "projv", "proj"):
                    w(b + f"cross_attn.{nm}.weight", D, D, scale=D**-0.5)
                    zeros(b + f"cross_attn.{nm}.bias", D)
                ones(b + "norm3.weight", D); zeros(b + "norm3.bias", D)
            w(b + "mlp.fc1.weight", 4 * D, D, scale=D**-0.5)
            zeros(b + "mlp.fc1.bias", 4 * D)
            w(b + "mlp.fc2.weight", D, 4 * D, scale=D**-0.5)
            zeros(b + "mlp.fc2.bias", D)

        w("patch_embed.proj.weight", De, 3, ps, ps)
        zeros("patch_embed.proj.bias", De)
        for i in range(c["enc_depth"]):
            block(f"enc_blocks.{i}.", De, cross=False)
        ones("enc_norm.weight", De); zeros("enc_norm.bias", De)
        w("decoder_embed.weight", Dd, De, scale=De**-0.5)
        zeros("decoder_embed.bias", Dd)
        for stack in ("dec_blocks", "dec_blocks2"):
            for i in range(c["dec_depth"]):
                block(f"{stack}.{i}.", Dd, cross=True)
        ones("dec_norm.weight", Dd); zeros("dec_norm.bias", Dd)

        ld = c["dpt_layer_dims"]
        F = c["dpt_feature_dim"]
        for hname in ("downstream_head1", "downstream_head2"):
            hp = hname + ".dpt."
            dims_in = (De, Dd, Dd, Dd)
            for k in range(4):
                w(hp + f"act_postprocess.{k}.0.weight", ld[k], dims_in[k], 1, 1, scale=0.05)
                zeros(hp + f"act_postprocess.{k}.0.bias", ld[k])
            w(hp + "act_postprocess.0.1.weight", ld[0], ld[0], 4, 4, scale=0.05)
            zeros(hp + "act_postprocess.0.1.bias", ld[0])
            w(hp + "act_postprocess.1.1.weight", ld[1], ld[1], 2, 2, scale=0.05)
            zeros(hp + "act_postprocess.1.1.bias", ld[1])
            w(hp + "act_postprocess.3.1.weight", ld[3], ld[3], 3, 3, scale=0.05)
            zeros(hp + "act_postprocess.3.1.bias", ld[3])
            for k in range(1, 5):
                w(hp + f"scratch.layer{k}_rn.weight", F, ld[k - 1], 3, 3, scale=0.05)
            for k in range(1, 5):
                rb = hp + f"scratch.refinenet{k}."
                for unit in ("resConfUnit1", "resConfUnit2"):
                    w(rb + unit + ".conv1.weight", F, F, 3, 3, scale=0.05)
                    zeros(rb + unit + ".conv1.bias", F)
                    w(rb + unit + ".conv2.weight", F, F, 3, 3, scale=0.05)
                    zeros(rb + unit + ".conv2.bias", F)
                w(rb + "out_conv.weight", F, F, 1, 1, scale=0.05)
                zeros(rb + "out_conv.bias", F)
            w(hp + "head.0.weight", F // 2, F, 3, 3, scale=0.05)
            zeros(hp + "head.0.bias", F // 2)
            w(hp + "head.2.weight", 32, F // 2, 3, 3, scale=0.05)
            zeros(hp + "head.2.bias", 32)
            w(hp + "head.4.weight", 4, 32, 1, 1, scale=0.05)
            zeros(hp + "head.4.bias", 4)
            idim = De + Dd
            hid = int(c["mlp_hidden_factor"] * idim)
            odim = (dd + 1) * ps * ps
            w(hname + ".head_local_features.fc1.weight", hid, idim, scale=idim**-0.5)
            zeros(hname + ".head_local_features.fc1.bias", hid)
            w(hname + ".head_local_features.fc2.weight", odim, hid, scale=hid**-0.5)
            zeros(hname + ".head_local_features.fc2.bias", odim)
        self.params = jax.tree.map(jnp.asarray, p)
        return self.params

    # ------------------------------------------------------------ encoder
    def _block(self, p, b, x, cos, sin, heads, ctx=None):
        D = x.shape[-1]
        B = x.shape[0]
        hd = D // heads
        y = _ln(x, p[b + "norm1.weight"], p[b + "norm1.bias"])
        qkv = jnp.einsum("bnd,ed->bne", y, p[b + "attn.qkv.weight"]) + p[b + "attn.qkv.bias"]
        qkv = qkv.reshape(B, -1, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        a = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5)
        a = jax.nn.softmax(a, -1)
        y = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, -1, D)
        y = jnp.einsum("bnd,ed->bne", y, p[b + "attn.proj.weight"]) + p[b + "attn.proj.bias"]
        x = x + y
        if ctx is not None:
            ym = _ln(ctx, p[b + "norm_y.weight"], p[b + "norm_y.bias"])
            xq = _ln(x, p[b + "norm2.weight"], p[b + "norm2.bias"])
            q = (jnp.einsum("bnd,ed->bne", xq, p[b + "cross_attn.projq.weight"])
                 + p[b + "cross_attn.projq.bias"]).reshape(B, -1, heads, hd)
            kk = (jnp.einsum("bnd,ed->bne", ym, p[b + "cross_attn.projk.weight"])
                  + p[b + "cross_attn.projk.bias"]).reshape(B, -1, heads, hd)
            vv = (jnp.einsum("bnd,ed->bne", ym, p[b + "cross_attn.projv.weight"])
                  + p[b + "cross_attn.projv.bias"]).reshape(B, -1, heads, hd)
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
            a = jnp.einsum("bnhd,bmhd->bhnm", q, kk) * (hd**-0.5)
            a = jax.nn.softmax(a, -1)
            y = jnp.einsum("bhnm,bmhd->bnhd", a, vv).reshape(B, -1, D)
            y = jnp.einsum("bnd,ed->bne", y, p[b + "cross_attn.proj.weight"]) + p[b + "cross_attn.proj.bias"]
            x = x + y
            mn = "norm3"
        else:
            mn = "norm2"
        y = _ln(x, p[b + f"{mn}.weight"], p[b + f"{mn}.bias"])
        y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc1.weight"]) + p[b + "mlp.fc1.bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("bnd,ed->bne", y, p[b + "mlp.fc2.weight"]) + p[b + "mlp.fc2.bias"]
        return x + y

    def _encode(self, p, x, patch_hw, cos, sin):
        c = self.conf
        h, w = patch_hw
        ps = c["patch"]
        B = x.shape[0]
        Wp = jnp.transpose(p["patch_embed.proj.weight"], (2, 3, 1, 0))
        xp = x.reshape(B, h, ps, w, ps, 3)
        tok = jnp.einsum("bhpwqc,pqcd->bhwd", xp, Wp).reshape(B, h * w, c["enc_dim"])
        tok = tok + p["patch_embed.proj.bias"]
        for i in range(c["enc_depth"]):
            tok = self._block(p, f"enc_blocks.{i}.", tok, cos, sin, c["enc_heads"])
        return _ln(tok, p["enc_norm.weight"], p["enc_norm.bias"])

    # --------------------------------------------------------------- head
    def _dpt_head(self, p, hname, hooks, patch_hw):
        c = self.conf
        h, w = patch_hw
        hp = hname + ".dpt."
        F = c["dpt_feature_dim"]
        B = hooks[0].shape[0]
        pyr = []
        for k, tok in enumerate(hooks):
            y = tok.reshape(B, h, w, tok.shape[-1])
            Wk = p[hp + f"act_postprocess.{k}.0.weight"][:, :, 0, 0]
            y = jnp.einsum("bhwc,oc->bhwo", y, Wk) + p[hp + f"act_postprocess.{k}.0.bias"]
            if k == 0:
                wgt = p[hp + "act_postprocess.0.1.weight"]
                y = jnp.einsum("bhwc,copq->bhpwqo", y, wgt).reshape(
                    B, h * 4, w * 4, wgt.shape[1]
                ) + p[hp + "act_postprocess.0.1.bias"]
            elif k == 1:
                wgt = p[hp + "act_postprocess.1.1.weight"]
                y = jnp.einsum("bhwc,copq->bhpwqo", y, wgt).reshape(
                    B, h * 2, w * 2, wgt.shape[1]
                ) + p[hp + "act_postprocess.1.1.bias"]
            elif k == 3:
                y = _conv(y, p[hp + "act_postprocess.3.1.weight"],
                          p[hp + "act_postprocess.3.1.bias"], stride=2)
            y = _conv(y, p[hp + f"scratch.layer{k+1}_rn.weight"])
            pyr.append(y)

        def rcu(prefix, x):
            y = jax.nn.relu(x)
            y = _conv(y, p[prefix + ".conv1.weight"], p[prefix + ".conv1.bias"])
            y = jax.nn.relu(y)
            y = _conv(y, p[prefix + ".conv2.weight"], p[prefix + ".conv2.bias"])
            return x + y

        def fuse(i, x, res, size):
            rb = hp + f"scratch.refinenet{i}"
            if res is not None:
                x = x + rcu(rb + ".resConfUnit1", res)
            x = rcu(rb + ".resConfUnit2", x)
            x = _resize(x, size, align_corners=True)
            return _conv(x, p[rb + ".out_conv.weight"], p[rb + ".out_conv.bias"])

        path = fuse(4, pyr[3], None, pyr[2].shape[1:3])
        path = fuse(3, path, pyr[2], pyr[1].shape[1:3])
        path = fuse(2, path, pyr[1], pyr[0].shape[1:3])
        path = fuse(1, path, pyr[0], (pyr[0].shape[1] * 2, pyr[0].shape[2] * 2))

        y = _conv(path, p[hp + "head.0.weight"], p[hp + "head.0.bias"])
        y = _resize(y, (h * c["patch"], w * c["patch"]))
        y = jax.nn.relu(_conv(y, p[hp + "head.2.weight"], p[hp + "head.2.bias"]))
        y = _conv(y, p[hp + "head.4.weight"], p[hp + "head.4.bias"])  # (B,H,W,4)
        # postprocess (dust3r heads/postprocess.py): directional exp + conf
        xyz = y[..., :3]
        n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        pts3d = xyz / jnp.maximum(n, 1e-8) * jnp.expm1(n)
        conf = 1.0 + jnp.exp(y[..., 3])
        return pts3d, conf

    def _local_features(self, p, hname, enc_tok, dec_tok, patch_hw):
        c = self.conf
        h, w = patch_hw
        ps, dd = c["patch"], c["desc_dim"]
        B = enc_tok.shape[0]
        cat = jnp.concatenate([enc_tok, dec_tok], -1)
        y = jnp.einsum("bnd,ed->bne", cat, p[hname + ".head_local_features.fc1.weight"]) \
            + p[hname + ".head_local_features.fc1.bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("bnd,ed->bne", y, p[hname + ".head_local_features.fc2.weight"]) \
            + p[hname + ".head_local_features.fc2.bias"]  # (B,N,(dd+1)p²)
        y = y.reshape(B, h, w, dd + 1, ps, ps)
        y = y.transpose(0, 1, 4, 2, 5, 3).reshape(B, h * ps, w * ps, dd + 1)  # pixel_shuffle
        desc = y[..., :dd]
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        desc_conf = 1.0 + jnp.exp(y[..., dd])
        return desc, desc_conf

    # ------------------------------------------------------------ forward
    def _forward(self, p, xa, xb, patch_hw):
        """xa/xb (B,14h... 16h,16w,3) dust3r-normalized. Returns per-view
        pts3d (both in view-1's frame), conf, desc, desc_conf."""
        c = self.conf
        h, w = patch_hw
        cos_e, sin_e = rope_tables(h, w, c["enc_dim"] // c["enc_heads"], c["rope_freq"])
        cos_d, sin_d = rope_tables(h, w, c["dec_dim"] // c["dec_heads"], c["rope_freq"])

        both = jnp.concatenate([xa, xb], 0)
        tok = self._encode(p, both, patch_hw, cos_e, sin_e)
        B = xa.shape[0]
        f1e, f2e = tok[:B], tok[B:]

        f1 = jnp.einsum("bnd,ed->bne", f1e, p["decoder_embed.weight"]) + p["decoder_embed.bias"]
        f2 = jnp.einsum("bnd,ed->bne", f2e, p["decoder_embed.weight"]) + p["decoder_embed.bias"]
        outs1, outs2 = [f1e], [f2e]
        for i in range(c["dec_depth"]):
            f1n = self._block(p, f"dec_blocks.{i}.", f1, cos_d, sin_d, c["dec_heads"], ctx=f2)
            f2n = self._block(p, f"dec_blocks2.{i}.", f2, cos_d, sin_d, c["dec_heads"], ctx=f1)
            f1, f2 = f1n, f2n
            outs1.append(f1)
            outs2.append(f2)
        outs1[-1] = _ln(outs1[-1], p["dec_norm.weight"], p["dec_norm.bias"])
        outs2[-1] = _ln(outs2[-1], p["dec_norm.weight"], p["dec_norm.bias"])

        d = c["dec_depth"]
        hooks_idx = (0, d * 2 // 4, d * 3 // 4, d)  # dust3r create_dpt_head
        h1 = [outs1[i] for i in hooks_idx]
        h2 = [outs2[i] for i in hooks_idx]
        pts1, conf1 = self._dpt_head(p, "downstream_head1", h1, patch_hw)
        pts2, conf2 = self._dpt_head(p, "downstream_head2", h2, patch_hw)
        desc1, dconf1 = self._local_features(p, "downstream_head1", f1e, outs1[-1], patch_hw)
        desc2, dconf2 = self._local_features(p, "downstream_head2", f2e, outs2[-1], patch_hw)
        return {
            "pts0": pts1, "conf0": conf1, "desc0": desc1, "desc_conf0": dconf1,
            "pts1": pts2, "conf1": conf2, "desc1": desc2, "desc_conf1": dconf2,
        }


class Mast3rMatcher:
    """Dense-matcher interface around the EXACT Mast3rNet (drop-in where
    TwoViewMatcher is used): pair of images -> keypoints0/1 + certainty
    via reciprocal NN on the descriptor maps; per-pair metric depth
    (pointmap z in view-1's frame, variance (1/conf)^2 — reference
    mast3r.py:303-315) for the 'depth' mode; descriptor sampling at
    detected keypoints for the 'sparse' mode
    (extract_correspondences_sparse, mast3r.py:173-190). Activates on
    the official checkpoint via conf.weights_path; random weights
    otherwise (smoke paths)."""

    default_conf = {
        "stride": 4,
        "max_matches": 4096,
        "certainty_threshold": 0.0,
        "weights_path": None,
    }

    def __init__(self, conf=None):
        conf = {**self.default_conf, **(conf or {})}
        self.conf = conf
        self.net = Mast3rNet(conf)
        if self.net.params is None:
            if self.net.conf["enc_dim"] >= 512 and not conf.get("allow_random"):
                raise RuntimeError(
                    "MASt3R matcher has no weights in this environment. "
                    "Set dense_matcher_conf.weights_path to "
                    "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth "
                    "(zero-egress images ship no checkpoints; pass "
                    "allow_random: true for compile/throughput smokes)."
                )
            self.net.init_random(0)  # tiny test configs / smoke paths

    def _prep(self, img):
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        return (img - DUST3R_MEAN) / DUST3R_STD

    def _forward(self, imgA, imgB):
        A, B = self._prep(imgA), self._prep(imgB)
        ps = self.net.conf["patch"]
        H = max(A.shape[0], B.shape[0])
        W = max(A.shape[1], B.shape[1])
        Hb, Wb = ((H + ps - 1) // ps) * ps, ((W + ps - 1) // ps) * ps
        xa = np.zeros((1, Hb, Wb, 3), np.float32)
        xb = np.zeros((1, Hb, Wb, 3), np.float32)
        xa[0, : A.shape[0], : A.shape[1]] = A
        xb[0, : B.shape[0], : B.shape[1]] = B
        out = self.net._jit_fwd(
            self.net.params, jnp.asarray(xa), jnp.asarray(xb), (Hb // ps, Wb // ps)
        )
        return out, (A.shape[:2], B.shape[:2])

    def __call__(self, imgA, imgB):
        from mpsfm_tpu.extraction.nets.two_view import _reciprocal_nn

        out, (shA, shB) = self._forward(imgA, imgB)
        ptsA, ptsB, score, mutual = _reciprocal_nn(
            out["desc0"][0], out["desc1"][0], out["conf0"][0], out["conf1"][0],
            stride=self.conf["stride"],
        )
        ptsA, ptsB = np.asarray(ptsA), np.asarray(ptsB)
        score, mutual = np.asarray(score), np.asarray(mutual)
        keep = mutual & (score > self.conf["certainty_threshold"])
        keep &= (ptsA[:, 0] < shA[1]) & (ptsA[:, 1] < shA[0])
        keep &= (ptsB[:, 0] < shB[1]) & (ptsB[:, 1] < shB[0])
        idx = np.where(keep)[0]
        if len(idx) > self.conf["max_matches"]:
            idx = idx[np.argsort(-score[idx])[: self.conf["max_matches"]]]
        return {
            "keypoints0": ptsA[idx],
            "keypoints1": ptsB[idx],
            "certainty": score[idx],
        }

    def pair_depth(self, imgA, imgB):
        out, (shA, shB) = self._forward(imgA, imgB)
        res = {}
        for key, sh, z, c in (
            ("0", shA, out["pts0"][0, ..., 2], out["conf0"][0]),
            ("1", shB, out["pts1"][0, ..., 2], out["conf1"][0]),
        ):
            z = np.asarray(z)[: sh[0], : sh[1]].astype(np.float64)
            c = np.asarray(c)[: sh[0], : sh[1]].astype(np.float64)
            res[key] = {
                "depth": z,
                "valid": z > 0,
                "variance": np.square(1.0 / np.maximum(c, 1e-3)),
            }
        return res

    def descriptors_at(self, img_pair_out, kps, view: int):
        from mpsfm_tpu.utils.interp import sample_bilinear

        desc = np.asarray(img_pair_out[f"desc{view}"][0])
        return sample_bilinear(desc, np.asarray(kps))
