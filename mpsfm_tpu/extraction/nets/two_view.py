"""Two-view cross-attention matcher (MASt3R/DUSt3R-class, Flax).

Architecture class of the reference's Mast3rMatcher (SURVEY.md §2.1:
mpsfm/extraction/pairwise/models/mast3r.py:209-316): a shared ViT
encoder runs once per image, a decoder of interleaved self/cross
attention blocks exchanges information between the two views
symmetrically, and DPT-style heads regress per-pixel

  * pointmap (3: camera-frame 3D point per pixel of view i, giving the
    'depth' matching mode z + (1/conf)^2 variance),
  * confidence (1),
  * descriptor map (d: dense matching via reciprocal nearest neighbors,
    or sampled at detected keypoints for the 'sparse' mode).

TPU-first: both directions run in ONE batched forward (stack [A,B] and
[B,A] cross-pairs), all attention via einsum on the MXU, reciprocal-NN
matching as one jitted argmax program (no KDTree host round-trips).

Weights: `two_view_params_from_torch` maps a CroCo/DUSt3R-style naming;
random init otherwise.
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
from mpsfm_tpu.extraction.nets.vit import Attention, ViT


class CrossAttention(nn.Module if nn else object):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, ctx):  # (B,N,D), (B,M,D)
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        q = nn.Dense(D, name="q")(x).reshape(B, N, H, hd)
        k = nn.Dense(D, name="k")(ctx).reshape(B, -1, H, hd)
        v = nn.Dense(D, name="v")(ctx).reshape(B, -1, H, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, name="proj")(y)


class DecoderBlock(nn.Module if nn else object):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, ctx):
        x = x + Attention(self.dim, self.num_heads, name="self_attn")(nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.dim, self.num_heads, name="cross_attn")(
            nn.LayerNorm(name="norm2")(x), nn.LayerNorm(name="norm_ctx")(ctx)
        )
        y = nn.LayerNorm(name="norm3")(x)
        h = nn.gelu(nn.Dense(4 * self.dim, name="mlp_fc1")(y), approximate=False)
        return x + nn.Dense(self.dim, name="mlp_fc2")(h)


class TwoViewNet(nn.Module if nn else object):
    dim: int = 192
    enc_depth: int = 6
    dec_depth: int = 4
    num_heads: int = 3
    patch: int = 16
    feat: int = 64
    desc_dim: int = 24

    @nn.compact
    def __call__(self, imA, imB):  # (B,H,W,3) x2 -> per-view outputs
        B, H, W, _ = imA.shape
        h, w = H // self.patch, W // self.patch
        enc = ViT(
            self.dim, self.enc_depth, self.num_heads, self.patch,
            hooks=(self.enc_depth - 1,), with_cls=False, name="encoder",
        )
        # one batched encoder pass over both views
        both = jnp.concatenate([imA, imB], 0)
        tok = enc(both)[0].reshape(2 * B, h * w, self.dim)
        tA, tB = tok[:B], tok[B:]
        # symmetric decoder: both directions in one batch (A|ctx=B, B|ctx=A)
        x = jnp.concatenate([tA, tB], 0)
        ctx = jnp.concatenate([tB, tA], 0)
        feats = []
        hook_every = max(self.dec_depth // 4, 1)
        for i in range(self.dec_depth):
            x = DecoderBlock(self.dim, self.num_heads, name=f"dec_{i}")(x, ctx)
            if (i + 1) % hook_every == 0 or i == self.dec_depth - 1:
                feats.append(x.reshape(2 * B, h, w, self.dim))
        feats = feats[-4:] if len(feats) >= 4 else feats + [feats[-1]] * (4 - len(feats))
        fused = DPTDecoder(self.feat, name="decoder")(feats)
        fused = jax.image.resize(fused, (2 * B, H, W, fused.shape[-1]), "bilinear")
        pts = Head(3, self.feat, name="point_head")(fused)
        # positive-z pointmap (exp on the z channel, MASt3R convention-ish)
        pts = jnp.concatenate([pts[..., :2], jnp.exp(jnp.clip(pts[..., 2:], -8, 8))], -1)
        conf = 1.0 + nn.softplus(Head(1, self.feat, name="conf_head")(fused))[..., 0]
        desc = Head(self.desc_dim, self.feat, name="desc_head")(fused)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return {
            "pts0": pts[:B], "pts1": pts[B:],
            "conf0": conf[:B], "conf1": conf[B:],
            "desc0": desc[:B], "desc1": desc[B:],
        }


from functools import partial


@partial(jax.jit, static_argnums=(4,))
def _reciprocal_nn(descA, descB, confA, confB, stride: int = 4):
    """Grid-subsampled reciprocal NN matching on descriptor maps.
    descA/B: (H,W,D). Returns (idxA (N,2) yx, idxB (N,2), score (N,),
    valid mask) over the strided grid of A."""
    Ha, Wa, D = descA.shape
    Hb, Wb, _ = descB.shape
    ga = descA[::stride, ::stride].reshape(-1, D)  # (Na,D)
    gb = descB[::stride, ::stride].reshape(-1, D)
    sim = ga @ gb.T  # (Na,Nb)
    j = jnp.argmax(sim, 1)
    i_back = jnp.argmax(sim, 0)
    ar = jnp.arange(ga.shape[0])
    mutual = i_back[j] == ar
    wa = Wa // stride if Wa % stride == 0 else (Wa + stride - 1) // stride
    wb = Wb // stride if Wb % stride == 0 else (Wb + stride - 1) // stride
    ya, xa = ar // wa, ar % wa
    yb, xb = j // wb, j % wb
    ca = confA[::stride, ::stride].reshape(-1)
    cb = confB[::stride, ::stride].reshape(-1)[j]
    score = jnp.minimum(ca, cb) * jnp.take_along_axis(sim, j[:, None], 1)[:, 0]
    ptsA = jnp.stack([xa * stride, ya * stride], -1).astype(jnp.float32)
    ptsB = jnp.stack([xb * stride, yb * stride], -1).astype(jnp.float32)
    return ptsA, ptsB, score, mutual


class TwoViewMatcher:
    """Dense-matcher interface around TwoViewNet (drop-in for
    DenseNCCMatcher): pair of images -> keypoints0/1 + certainty; also
    exposes per-pair depth (pointmap z, variance (1/conf)^2) for the
    'depth' matching mode and descriptor sampling for 'sparse'."""

    default_conf = {
        "stride": 4,
        "max_matches": 4096,
        "certainty_threshold": 0.0,
        "dim": 192, "enc_depth": 6, "dec_depth": 4, "num_heads": 3,
        "feat": 64, "desc_dim": 24,
        "weights_path": None,
    }

    def __init__(self, conf=None):
        self.conf = {**self.default_conf, **(conf or {})}
        c = self.conf
        self.net = TwoViewNet(
            dim=c["dim"], enc_depth=c["enc_depth"], dec_depth=c["dec_depth"],
            num_heads=c["num_heads"], feat=c["feat"], desc_dim=c["desc_dim"],
        )
        self.params = None
        if c["weights_path"]:
            self.params = load_two_view_params(c["weights_path"], self.net)
        self._fwd = jax.jit(lambda p, a, b: self.net.apply(p, a, b))

    def _prep(self, img):
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        return img

    def _forward(self, imgA, imgB):
        A, B = self._prep(imgA), self._prep(imgB)
        p = self.net.patch
        H = max(A.shape[0], B.shape[0])
        W = max(A.shape[1], B.shape[1])
        Hb, Wb = ((H + p - 1) // p) * p, ((W + p - 1) // p) * p
        xa = np.zeros((1, Hb, Wb, 3), np.float32)
        xb = np.zeros((1, Hb, Wb, 3), np.float32)
        xa[0, : A.shape[0], : A.shape[1]] = A
        xb[0, : B.shape[0], : B.shape[1]] = B
        if self.params is None:
            self.params = self.net.init(jax.random.PRNGKey(0), jnp.asarray(xa), jnp.asarray(xb))
        out = self._fwd(self.params, jnp.asarray(xa), jnp.asarray(xb))
        return out, (A.shape[:2], B.shape[:2])

    def __call__(self, imgA, imgB):
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
        """'depth' mode: per-view metric-up-to-scale depth + variance
        (reference mast3r.py:303-315: z of the pointmap, (1/conf)^2)."""
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
        """'sparse' mode support: bilinear descriptor sampling at detected
        keypoints (reference extract_correspondences_sparse)."""
        from mpsfm_tpu.utils.interp import sample_bilinear

        desc = np.asarray(img_pair_out[f"desc{view}"][0])
        return sample_bilinear(desc, np.asarray(kps))


def load_two_view_params(path, net: TwoViewNet):
    from pathlib import Path

    p = Path(path)
    if p.suffix in (".msgpack", ".flax"):
        import flax.serialization as ser

        dummy = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
        return ser.from_bytes(dummy, p.read_bytes())
    import torch

    sd = torch.load(p, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:  # CroCo/DUSt3R ckpt wrapper
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return two_view_params_from_torch(sd, enc_depth=net.enc_depth, dec_depth=net.dec_depth)


def two_view_params_from_torch(sd, enc_depth: int = 6, dec_depth: int = 4):
    """CroCo/DUSt3R-style torch naming -> TwoViewNet params.

    Expected keys (tested against a torch twin in tests/test_converters_dense.py):
      encoder.*                 timm ViT (patch_embed.proj, blocks.N.*, norm)
      dec_blocks.N.norm1 / attn.qkv / attn.proj          self-attention
      dec_blocks.N.norm2 / norm_y / cross_attn.projq/projk/projv/proj
      dec_blocks.N.norm3 / mlp.fc1 / mlp.fc2             feed-forward
      decoder.* / point_head.* / conf_head.* / desc_head.*   DPT + heads
        (same conv naming as mono_params_from_torch)
    """
    from mpsfm_tpu.extraction.nets.vit import vit_params_from_torch

    def _t(w):
        return np.asarray(w).T

    def lin(k):
        return {"kernel": _t(sd[k + ".weight"]), "bias": np.asarray(sd[k + ".bias"])}

    def ln(k):
        return {"scale": np.asarray(sd[k + ".weight"]), "bias": np.asarray(sd[k + ".bias"])}

    def conv(k):
        return {
            "kernel": np.transpose(np.asarray(sd[k + ".weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(sd[k + ".bias"]),
        }

    params = {"encoder": vit_params_from_torch(sd, depth=enc_depth, prefix="encoder.")["params"]}
    for i in range(dec_depth):
        b = f"dec_blocks.{i}."
        params[f"dec_{i}"] = {
            "norm1": ln(b + "norm1"),
            "self_attn": {"qkv": lin(b + "attn.qkv"), "proj": lin(b + "attn.proj")},
            "norm2": ln(b + "norm2"),
            "norm_ctx": ln(b + "norm_y"),
            "cross_attn": {
                "q": lin(b + "cross_attn.projq"),
                "k": lin(b + "cross_attn.projk"),
                "v": lin(b + "cross_attn.projv"),
                "proj": lin(b + "cross_attn.proj"),
            },
            "norm3": ln(b + "norm3"),
            "mlp_fc1": lin(b + "mlp.fc1"),
            "mlp_fc2": lin(b + "mlp.fc2"),
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
    params["decoder"] = dec

    def head(prefix):
        return {"conv1": conv(prefix + ".conv1"), "conv2": conv(prefix + ".conv2"), "out": conv(prefix + ".out")}

    params["point_head"] = head("point_head")
    params["conf_head"] = head("conf_head")
    params["desc_head"] = head("desc_head")
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}
