"""DPT dense-prediction decoder (Flax).

The decoder family used by the reference's monocular backends
(Metric3Dv2 / DepthAnything / DepthPro are all DPT-style readouts over
ViT hooks — SURVEY.md §2.4): per-hook reassembly to a feature pyramid,
residual fusion upsampling, and task heads. TPU-first: everything is
convs/resizes on NHWC batches, no dynamic shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


class ResidualConvUnit(nn.Module if nn else object):
    feat: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.feat, (3, 3), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.feat, (3, 3), padding="SAME", name="conv2")(y)
        return x + y


class FusionBlock(nn.Module if nn else object):
    feat: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            # odd grids: align to the skip's resolution before adding
            if x.shape[1:3] != skip.shape[1:3]:
                B, _, _, C = x.shape
                x = jax.image.resize(x, (B, skip.shape[1], skip.shape[2], C), "bilinear")
            x = x + ResidualConvUnit(self.feat, name="rcu1")(skip)
        x = ResidualConvUnit(self.feat, name="rcu2")(x)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
        return nn.Conv(self.feat, (1, 1), name="project")(x)


class DPTDecoder(nn.Module if nn else object):
    """hooks (list of (B,h,w,D), coarse->fine order irrelevant: all share
    h,w for a plain ViT) -> (B, h*8, w*8, feat) fused feature map."""

    feat: int = 128
    scales: Sequence[int] = (4, 2, 1, -2)  # per-hook resample factor (+up/-down)

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.scales)
        pyr = []
        for i, (f, s) in enumerate(zip(feats, self.scales)):
            y = nn.Conv(self.feat, (1, 1), name=f"read_{i}")(f)
            B, h, w, C = y.shape
            if s > 1:
                y = jax.image.resize(y, (B, h * s, w * s, C), "bilinear")
            elif s < -1:
                y = nn.avg_pool(y, (-s, -s), (-s, -s))
            y = nn.Conv(self.feat, (3, 3), padding="SAME", name=f"proj_{i}")(y)
            pyr.append(y)
        # fuse coarsest -> finest
        x = FusionBlock(self.feat, name="fuse_3")(pyr[3])
        x = FusionBlock(self.feat, name="fuse_2")(x, pyr[2])
        x = FusionBlock(self.feat, name="fuse_1")(x, pyr[1])
        x = FusionBlock(self.feat, name="fuse_0")(x, pyr[0])
        return x  # (B, h*8, w*8, feat)  [4x hook grid * 2 per fusion... net 8x]


class Head(nn.Module if nn else object):
    out: int
    feat: int = 128

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.feat // 2, (3, 3), padding="SAME", name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(32, (3, 3), padding="SAME", name="conv2")(y)
        y = nn.relu(y)
        return nn.Conv(self.out, (1, 1), name="out")(y)
