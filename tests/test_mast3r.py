"""MASt3R exact-port parity: JAX forward vs an independent torch twin
built in-test from the public spec (CroCo ViT encoder with RoPE2D,
asymmetric dual decoder, DPT pointmap head, catMLP local-feature head),
under the official checkpoint naming
(``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth`` layout).

Reference surface: mpsfm/extraction/pairwise/models/mast3r.py:209-316
(wrapper semantics) + naver/mast3r + naver/dust3r/croco model code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

TINY = dict(
    enc_dim=32, enc_depth=2, enc_heads=2,
    dec_dim=24, dec_depth=4, dec_heads=2,
    patch=16, desc_dim=6, rope_freq=100.0,
    dpt_layer_dims=(8, 12, 16, 16), dpt_feature_dim=16,
    mlp_hidden_factor=1.0,
)


# ---------------------------------------------------------------- RoPE 2D
class RoPE2D:
    """CroCo RoPE2D (GPT-NeoX rotate-half per coordinate half)."""

    def __init__(self, freq=100.0):
        self.freq = freq

    def _1d(self, tok, pos1d):
        # tok (B,H,N,D)
        D = tok.shape[-1]
        inv = 1.0 / (self.freq ** (torch.arange(0, D, 2).float() / D))
        f = torch.einsum("n,k->nk", pos1d.float(), inv)
        f = torch.cat((f, f), dim=-1)
        cos, sin = f.cos()[None, None], f.sin()[None, None]
        x1, x2 = tok.chunk(2, dim=-1)
        rot = torch.cat((-x2, x1), dim=-1)
        return tok * cos + rot * sin

    def __call__(self, tok, pos):
        # tok (B,H,N,hd), pos (N,2)
        y, x = tok.chunk(2, dim=-1)
        y = self._1d(y, pos[:, 0])
        x = self._1d(x, pos[:, 1])
        return torch.cat((y, x), dim=-1)


class _Attn(nn.Module):
    def __init__(self, D, heads, rope):
        super().__init__()
        self.qkv = nn.Linear(D, 3 * D)
        self.proj = nn.Linear(D, D)
        self.heads, self.rope = heads, rope

    def forward(self, x, pos):
        B, N, D = x.shape
        H = self.heads
        hd = D // H
        q, k, v = self.qkv(x).reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        q = self.rope(q, pos)
        k = self.rope(k, pos)
        a = (q @ k.transpose(-1, -2)) * hd**-0.5
        y = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(y)


class _CrossAttn(nn.Module):
    def __init__(self, D, heads, rope):
        super().__init__()
        self.projq = nn.Linear(D, D)
        self.projk = nn.Linear(D, D)
        self.projv = nn.Linear(D, D)
        self.proj = nn.Linear(D, D)
        self.heads, self.rope = heads, rope

    def forward(self, x, y, pos):
        B, N, D = x.shape
        H = self.heads
        hd = D // H
        q = self.projq(x).reshape(B, N, H, hd).transpose(1, 2)
        k = self.projk(y).reshape(B, -1, H, hd).transpose(1, 2)
        v = self.projv(y).reshape(B, -1, H, hd).transpose(1, 2)
        q = self.rope(q, pos)
        k = self.rope(k, pos)
        a = (q @ k.transpose(-1, -2)) * hd**-0.5
        out = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class _Mlp(nn.Module):
    def __init__(self, D, hidden=None, out=None):
        super().__init__()
        self.fc1 = nn.Linear(D, hidden or 4 * D)
        self.fc2 = nn.Linear(hidden or 4 * D, out or D)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _EncBlock(nn.Module):
    def __init__(self, D, heads, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.attn = _Attn(D, heads, rope)
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.mlp = _Mlp(D)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class _DecBlock(nn.Module):
    def __init__(self, D, heads, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.attn = _Attn(D, heads, rope)
        self.cross_attn = _CrossAttn(D, heads, rope)
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.norm3 = nn.LayerNorm(D, eps=1e-6)
        self.norm_y = nn.LayerNorm(D, eps=1e-6)
        self.mlp = _Mlp(D)

    def forward(self, x, y, pos):
        x = x + self.attn(self.norm1(x), pos)
        x = x + self.cross_attn(self.norm2(x), self.norm_y(y), pos)
        return x + self.mlp(self.norm3(x))


class _DPT(nn.Module):
    def __init__(self, c):
        super().__init__()
        ld, Fd = c["dpt_layer_dims"], c["dpt_feature_dim"]
        dims_in = (c["enc_dim"], c["dec_dim"], c["dec_dim"], c["dec_dim"])
        self.act_postprocess = nn.ModuleList([
            nn.Sequential(nn.Conv2d(dims_in[0], ld[0], 1),
                          nn.ConvTranspose2d(ld[0], ld[0], 4, stride=4)),
            nn.Sequential(nn.Conv2d(dims_in[1], ld[1], 1),
                          nn.ConvTranspose2d(ld[1], ld[1], 2, stride=2)),
            nn.Sequential(nn.Conv2d(dims_in[2], ld[2], 1)),
            nn.Sequential(nn.Conv2d(dims_in[3], ld[3], 1),
                          nn.Conv2d(ld[3], ld[3], 3, stride=2, padding=1)),
        ])
        self.scratch = nn.Module()
        for k in range(1, 5):
            setattr(self.scratch, f"layer{k}_rn",
                    nn.Conv2d(ld[k - 1], Fd, 3, padding=1, bias=False))
        for k in range(1, 5):
            rb = nn.Module()
            for unit in ("resConfUnit1", "resConfUnit2"):
                u = nn.Module()
                u.conv1 = nn.Conv2d(Fd, Fd, 3, padding=1)
                u.conv2 = nn.Conv2d(Fd, Fd, 3, padding=1)
                setattr(rb, unit, u)
            rb.out_conv = nn.Conv2d(Fd, Fd, 1)
            setattr(self.scratch, f"refinenet{k}", rb)
        self.head = nn.Sequential(
            nn.Conv2d(Fd, Fd // 2, 3, padding=1),
            nn.Identity(),  # placeholder for Interpolate (applied in forward)
            nn.Conv2d(Fd // 2, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, 4, 1),
        )

    def forward(self, hooks, hw, patch):
        h, w = hw
        pyr = []
        for k, tok in enumerate(hooks):
            B, N, D = tok.shape
            y = tok.transpose(1, 2).reshape(B, D, h, w)
            y = self.act_postprocess[k](y)
            y = getattr(self.scratch, f"layer{k+1}_rn")(y)
            pyr.append(y)

        def rcu(u, x):
            y = F.relu(x)
            y = u.conv2(F.relu(u.conv1(y)))
            return x + y

        def fuse(i, x, res, size):
            rb = getattr(self.scratch, f"refinenet{i}")
            if res is not None:
                x = x + rcu(rb.resConfUnit1, res)
            x = rcu(rb.resConfUnit2, x)
            x = F.interpolate(x, size, mode="bilinear", align_corners=True)
            return rb.out_conv(x)

        path = fuse(4, pyr[3], None, pyr[2].shape[2:])
        path = fuse(3, path, pyr[2], pyr[1].shape[2:])
        path = fuse(2, path, pyr[1], pyr[0].shape[2:])
        path = fuse(1, path, pyr[0], (pyr[0].shape[2] * 2, pyr[0].shape[3] * 2))
        y = self.head[0](path)
        y = F.interpolate(y, (h * patch, w * patch), mode="bilinear", align_corners=False)
        y = self.head[4](F.relu(self.head[2](y)))
        xyz, raw_conf = y[:, :3], y[:, 3]
        n = xyz.norm(dim=1, keepdim=True)
        pts = xyz / n.clamp_min(1e-8) * torch.expm1(n)
        return pts, 1.0 + raw_conf.exp()


class _Head(nn.Module):
    def __init__(self, c):
        super().__init__()
        idim = c["enc_dim"] + c["dec_dim"]
        self.dpt = _DPT(c)
        self.head_local_features = _Mlp(
            idim, hidden=int(c["mlp_hidden_factor"] * idim),
            out=(c["desc_dim"] + 1) * c["patch"] ** 2,
        )

    def forward(self, enc_tok, dec_tok, hooks, hw, c):
        pts, conf = self.dpt(hooks, hw, c["patch"])
        cat = torch.cat([enc_tok, dec_tok], -1)
        lf = self.head_local_features(cat)  # (B,N,(d+1)p²)
        B, N, _ = lf.shape
        h, w = hw
        lf = lf.transpose(-1, -2).view(B, -1, h, w)
        lf = F.pixel_shuffle(lf, c["patch"])  # (B,d+1,H,W)
        desc = lf[:, :-1]
        desc = desc / desc.norm(dim=1, keepdim=True).clamp_min(1e-8)
        return pts, conf, desc, 1.0 + lf[:, -1].exp()


class _TorchTwin(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c
        rope_e = RoPE2D(c["rope_freq"])
        De, Dd = c["enc_dim"], c["dec_dim"]
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, De, c["patch"], stride=c["patch"])
        self.enc_blocks = nn.ModuleList(
            [_EncBlock(De, c["enc_heads"], rope_e) for _ in range(c["enc_depth"])]
        )
        self.enc_norm = nn.LayerNorm(De, eps=1e-6)
        self.decoder_embed = nn.Linear(De, Dd)
        rope_d = RoPE2D(c["rope_freq"])
        self.dec_blocks = nn.ModuleList(
            [_DecBlock(Dd, c["dec_heads"], rope_d) for _ in range(c["dec_depth"])]
        )
        self.dec_blocks2 = nn.ModuleList(
            [_DecBlock(Dd, c["dec_heads"], rope_d) for _ in range(c["dec_depth"])]
        )
        self.dec_norm = nn.LayerNorm(Dd, eps=1e-6)
        self.downstream_head1 = _Head(c)
        self.downstream_head2 = _Head(c)

    def forward(self, xa, xb):
        c = self.c
        B = xa.shape[0]
        t = self.patch_embed.proj(torch.cat([xa, xb], 0))
        h, w = t.shape[2:]
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        pos = torch.stack([ys.reshape(-1), xs.reshape(-1)], -1)
        t = t.flatten(2).transpose(1, 2)
        for blk in self.enc_blocks:
            t = blk(t, pos)
        t = self.enc_norm(t)
        f1e, f2e = t[:B], t[B:]
        f1 = self.decoder_embed(f1e)
        f2 = self.decoder_embed(f2e)
        outs1, outs2 = [f1e], [f2e]
        for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
            f1n = b1(f1, f2, pos)
            f2n = b2(f2, f1, pos)
            f1, f2 = f1n, f2n
            outs1.append(f1)
            outs2.append(f2)
        outs1[-1] = self.dec_norm(outs1[-1])
        outs2[-1] = self.dec_norm(outs2[-1])
        d = c["dec_depth"]
        idx = (0, d * 2 // 4, d * 3 // 4, d)
        r1 = self.downstream_head1(f1e, outs1[-1], [outs1[i] for i in idx], (h, w), c)
        r2 = self.downstream_head2(f2e, outs2[-1], [outs2[i] for i in idx], (h, w), c)
        return r1, r2


# ------------------------------------------------------------------- tests
@pytest.mark.slow
def test_mast3r_torch_twin_parity():
    from mpsfm_tpu.extraction.nets.mast3r import Mast3rNet

    torch.manual_seed(0)
    twin = _TorchTwin(dict(TINY)).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    H = W = 64  # 4x4 patches of 16
    xa = torch.randn(2, 3, H, W)
    xb = torch.randn(2, 3, H, W)
    with torch.no_grad():
        (tp1, tc1, td1, tdc1), (tp2, tc2, td2, tdc2) = twin(xa, xb)

    net = Mast3rNet(TINY)
    net.params = net.params_from_torch_state_dict(
        {k: v.numpy() for k, v in twin.state_dict().items()}
    )
    out = net._forward(
        net.params,
        jnp.asarray(xa.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(xb.numpy().transpose(0, 2, 3, 1)),
        (H // 16, W // 16),
    )
    np.testing.assert_allclose(np.asarray(out["pts0"]),
                               tp1.numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["conf0"]), tc1.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["desc0"]),
                               td1.numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["desc_conf0"]), tdc1.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pts1"]),
                               tp2.numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["desc1"]),
                               td2.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_mast3r_official_names_roundtrip(tmp_path):
    """init_random emits the official key set; a saved checkpoint with the
    naver wrapper format ({'model': sd}) loads; full-size preset has the
    ViT-L/BaseDecoder dims."""
    from mpsfm_tpu.extraction.nets.mast3r import MODEL_CONFIG, Mast3rNet

    assert MODEL_CONFIG["enc_dim"] == 1024 and MODEL_CONFIG["enc_depth"] == 24
    assert MODEL_CONFIG["dec_dim"] == 768 and MODEL_CONFIG["dec_depth"] == 12
    assert MODEL_CONFIG["desc_dim"] == 24 and MODEL_CONFIG["patch"] == 16

    src = Mast3rNet(TINY)
    src.init_random(1)
    for k in ("patch_embed.proj.weight", "enc_blocks.0.attn.qkv.weight",
              "decoder_embed.weight", "dec_blocks2.3.cross_attn.projq.weight",
              "dec_blocks.0.norm_y.weight", "dec_norm.weight",
              "downstream_head1.dpt.scratch.refinenet4.out_conv.weight",
              "downstream_head2.head_local_features.fc2.weight"):
        assert k in src.params, k
    ckpt = tmp_path / "MASt3R_tiny.pth"
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in src.params.items()}},
        ckpt,
    )
    net = Mast3rNet({**TINY, "weights_path": str(ckpt)})
    assert net.params is not None and len(net.params) == len(src.params)


def test_mast3r_matcher_interface(tmp_path):
    """sp-mast3r(-dense) plumbing: the EXACT arch behind the dense-matcher
    interface — reciprocal-NN matches, per-pair depth (z of the pointmap,
    (1/conf)^2 variance), sparse descriptor sampling; checkpoint-ready via
    get_dense_matcher('mast3r')."""
    from mpsfm_tpu.extraction.base import get_dense_matcher
    from mpsfm_tpu.extraction.nets.mast3r import Mast3rMatcher, Mast3rNet

    src = Mast3rNet(TINY)
    src.init_random(2)
    ckpt = tmp_path / "MASt3R_tiny_metric.pth"
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in src.params.items()}},
        ckpt,
    )
    m = get_dense_matcher("mast3r", {**TINY, "weights_path": str(ckpt), "stride": 4})
    assert isinstance(m, Mast3rMatcher)
    rng = np.random.default_rng(0)
    imgA = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    imgB = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    out = m(imgA, imgB)
    assert out["keypoints0"].shape == out["keypoints1"].shape
    assert out["keypoints0"].shape[1] == 2
    pd = m.pair_depth(imgA, imgB)
    assert pd["0"]["depth"].shape == (48, 64)
    assert (pd["0"]["variance"] > 0).all()
    fwd, _ = m._forward(imgA, imgB)
    desc = m.descriptors_at(fwd, np.array([[10.0, 12.0], [30.0, 20.0]]), 0)
    assert desc.shape == (2, TINY["desc_dim"])


def test_extract_pair_depths_uses_matcher_pointmap(tmp_path):
    """'depth' matching mode: extract_pair_depths prefers the dense
    matcher's OWN per-pair depth (MASt3R pointmap z, (1/conf)^2 variance
    — reference match_dense_2view.py:191-199) over the per-image backend
    when no measured depth exists."""
    import cv2

    from mpsfm_tpu.extraction.base import Extraction
    from mpsfm_tpu.extraction.nets.mast3r import Mast3rNet
    from mpsfm_tpu.utils import io

    src = Mast3rNet(TINY)
    src.init_random(3)
    ckpt = tmp_path / "MASt3R_tiny_metric.pth"
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in src.params.items()}},
        ckpt,
    )

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = ["a.png", "b.png"]
    for n in names:
        cv2.imwrite(str(img_dir / n), (rng.random((48, 64, 3)) * 255).astype(np.uint8))

    class FakeParser:
        def image_names(self):
            return names

        def image_path(self, name):
            return img_dir / name

        def prior_inputs(self, name):
            return {}

    ex = Extraction(
        {"dense_matcher": "mast3r",
         "dense_matcher_conf": {**TINY, "weights_path": str(ckpt)}},
        FakeParser(), tmp_path / "cache",
    )
    path = ex.extract_pair_depths([("a.png", "b.png")])
    got = io.get_mono_map_from_pairs(path, "a.png", [("a.png", "b.png")])
    assert got is not None and got["depth"].shape == (48, 64)
    assert (got["depth_variance"] > 0).all()
