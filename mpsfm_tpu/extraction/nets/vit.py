"""Vision Transformer trunk (Flax) + timm-style torch checkpoint converter.

The shared encoder of the reference's heavy backends — Metric3Dv2's ViT,
MASt3R/DUSt3R's CroCo ViT, RoMa's DINOv2 (SURVEY.md §2.4) — expressed
once, TPU-first: fixed-shape batched forward, fused attention via
jnp.einsum (XLA maps QK^T/AV to the MXU), no data-dependent control
flow. Multi-depth feature hooks feed the DPT decoder.

Converter parity: `vit_params_from_torch` maps timm/DINOv2-style naming
(patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
mlp.fc2}, norm) onto this module; tested against a torch reference
forward in tests/test_nets.py.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


class Attention(nn.Module if nn else object):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = nn.Dense(3 * D, name="qkv")(x).reshape(B, N, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,H,hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, name="proj")(y)


class Block(nn.Module if nn else object):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, name="attn")(y)
        y = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, name="mlp_fc2")(h)
        return x


class ViT(nn.Module if nn else object):
    """Patch-embed ViT with multi-depth feature hooks.

    __call__(x (B,H,W,3)) -> list of (B, h, w, D) feature maps at
    `hooks` depths (after the block, pre final norm; the last hook gets
    the final LayerNorm applied — DPT convention)."""

    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch: int = 16
    hooks: Sequence[int] = (2, 5, 8, 11)
    with_cls: bool = True
    pos_grid: int = 24  # base positional grid side (resized to h, w)

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        h, w = H // self.patch, W // self.patch
        y = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
                    padding="VALID", name="patch_embed")(x)
        y = y.reshape(B, h * w, self.dim)
        # learned pos embedding over a base grid, bilinearly resized
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, self.pos_grid, self.pos_grid, self.dim)
        )
        if (h, w) != pos.shape[1:3]:
            import jax

            # antialias=False matches torch F.interpolate (timm pos resize)
            pos = jax.image.resize(pos, (1, h, w, self.dim), "bilinear", antialias=False)
        y = y + pos.reshape(1, h * w, self.dim)
        if self.with_cls:
            cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.dim))
            y = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), y], axis=1)

        feats = []
        for i in range(self.depth):
            y = Block(self.dim, self.num_heads, name=f"blocks_{i}")(y)
            if i in self.hooks:
                t = y[:, 1:] if self.with_cls else y
                if i == max(self.hooks):
                    t = nn.LayerNorm(name="norm")(t)
                feats.append(t.reshape(B, h, w, self.dim))
        return feats


def _t(w):
    return np.asarray(w).T


def vit_params_from_torch(sd, depth: int = 12, prefix: str = "") -> dict:
    """timm/DINOv2-style state dict -> ViT params (pure numpy)."""
    g = lambda k: np.asarray(sd[prefix + k])
    params = {
        "patch_embed": {
            # torch conv (O,I,kh,kw) -> flax (kh,kw,I,O)
            "kernel": np.transpose(g("patch_embed.proj.weight"), (2, 3, 1, 0)),
            "bias": g("patch_embed.proj.bias"),
        },
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    pe = g("pos_embed")  # (1, 1+N or N, D)
    n = pe.shape[1]
    if prefix + "cls_token" in sd:
        params["cls_token"] = g("cls_token")
        if int(np.sqrt(n - 1)) ** 2 == n - 1:
            side = int(np.sqrt(n - 1))
            pe = pe[:, 1:]
        else:
            side = int(np.sqrt(n))
    else:
        side = int(np.sqrt(n))
    params["pos_embed"] = pe[:, : side * side].reshape(1, side, side, -1)
    for i in range(depth):
        b = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "norm1": {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")},
            "norm2": {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": _t(g(b + "attn.qkv.weight")), "bias": g(b + "attn.qkv.bias")},
                "proj": {"kernel": _t(g(b + "attn.proj.weight")), "bias": g(b + "attn.proj.bias")},
            },
            "mlp_fc1": {"kernel": _t(g(b + "mlp.fc1.weight")), "bias": g(b + "mlp.fc1.bias")},
            "mlp_fc2": {"kernel": _t(g(b + "mlp.fc2.weight")), "bias": g(b + "mlp.fc2.bias")},
        }
    return {"params": params}
