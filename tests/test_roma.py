"""RoMa exact-port parity: JAX forward vs an independent torch twin built
in-test from the public spec (DINOv2 coarse encoder + VGG pyramid, GP
match encoder, transformer match decoder, ConvRefiner cascade), under the
official checkpoint naming (roma_outdoor.pth + dinov2_vitl14_pretrain.pth).

Reference surface: mpsfm/extraction/pairwise/models/roma.py:26-124
(wrapper semantics) + Parskatt/RoMa (romatch) model code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

TINY = dict(
    vit_dim=32, vit_depth=2, vit_heads=2, vit_patch=14, pos_grid=8,
    gp_dim=8, feat_dim=8, dec_blocks=2, dec_heads=2,
    cls_res=8, kernel_T=0.2, sigma_noise=0.1,
    vgg_spec=(("C", 4), "M", ("C", 6), "M", ("C", 8), "M", ("C", 12), "M"),
    scales=(
        ("16", 32, 8, 4, 2, 1, True),
        ("8", 12, 8, 4, 1, 1, True),
        ("4", 8, 6, 2, 0, 1, True),
        ("2", 6, 4, 2, 0, 1, True),
        ("1", 4, 3, 2, 0, 1, False),
    ),
    resolution=112,
)


class _Vit(nn.Module):
    """dinov2-named tiny ViT (LayerScale, no registers)."""

    def __init__(self, c):
        super().__init__()
        D, depth, M = c["vit_dim"], c["vit_depth"], c["pos_grid"]
        self.c = c
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + M * M, D) * 0.02)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D, c["vit_patch"], stride=c["vit_patch"])
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            b = nn.Module()
            b.norm1 = nn.LayerNorm(D, eps=1e-6)
            b.norm2 = nn.LayerNorm(D, eps=1e-6)
            b.attn = nn.Module()
            b.attn.qkv = nn.Linear(D, 3 * D)
            b.attn.proj = nn.Linear(D, D)
            b.ls1 = nn.Module(); b.ls1.gamma = nn.Parameter(torch.ones(D))
            b.ls2 = nn.Module(); b.ls2.gamma = nn.Parameter(torch.ones(D))
            b.mlp = nn.Module()
            b.mlp.fc1 = nn.Linear(D, 4 * D)
            b.mlp.fc2 = nn.Linear(4 * D, D)
            self.blocks.append(b)
        self.norm = nn.LayerNorm(D, eps=1e-6)

    def forward(self, x):
        c = self.c
        B = x.shape[0]
        D, H = c["vit_dim"], c["vit_heads"]
        t = self.patch_embed.proj(x)
        h, w = t.shape[2:]
        t = t.flatten(2).transpose(1, 2)
        t = t + self.pos_embed[:, 1:]
        cls = self.cls_token + self.pos_embed[:, :1]
        t = torch.cat([cls.expand(B, -1, -1), t], 1)
        for b in self.blocks:
            y = b.norm1(t)
            qkv = b.attn.qkv(y).reshape(B, -1, 3, H, D // H)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = torch.einsum("bnhd,bmhd->bhnm", q, k) * (D // H) ** -0.5
            y = torch.einsum("bhnm,bmhd->bnhd", a.softmax(-1), v).reshape(B, -1, D)
            t = t + b.attn.proj(y) * b.ls1.gamma
            y = b.norm2(t)
            t = t + b.mlp.fc2(F.gelu(b.mlp.fc1(y))) * b.ls2.gamma
        t = self.norm(t)
        return t[:, 1:].transpose(1, 2).reshape(B, D, h, w)


class _Vgg(nn.Module):
    def __init__(self, spec):
        super().__init__()
        layers = []
        cin = 3
        for e in spec:
            if e == "M":
                layers.append(nn.MaxPool2d(2))
            else:
                layers += [nn.Conv2d(cin, e[1], 3, padding=1),
                           nn.BatchNorm2d(e[1]), nn.ReLU()]
                cin = e[1]
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        feats = {}
        scale = 1
        for layer in self.layers:
            if isinstance(layer, nn.MaxPool2d):
                feats[scale] = x
                scale *= 2
            x = layer(x)
        return feats


class _TorchTwin(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c = c
        self.dinov2 = _Vit(c)
        self.encoder = nn.Module()
        self.encoder.cnn = _Vgg(c["vgg_spec"])
        Dd = c["gp_dim"] + c["feat_dim"]
        dec = nn.Module()
        ed = nn.Module()
        ed.blocks = nn.ModuleList()
        for _ in range(c["dec_blocks"]):
            b = nn.Module()
            b.norm1 = nn.LayerNorm(Dd, eps=1e-6)
            b.norm2 = nn.LayerNorm(Dd, eps=1e-6)
            b.attn = nn.Module()
            b.attn.qkv = nn.Linear(Dd, 3 * Dd)
            b.attn.proj = nn.Linear(Dd, Dd)
            b.ls1 = nn.Module(); b.ls1.gamma = nn.Parameter(torch.ones(Dd))
            b.ls2 = nn.Module(); b.ls2.gamma = nn.Parameter(torch.ones(Dd))
            b.mlp = nn.Module()
            b.mlp.fc1 = nn.Linear(Dd, 4 * Dd)
            b.mlp.fc2 = nn.Linear(4 * Dd, Dd)
            ed.blocks.append(b)
        ed.to_out = nn.Linear(Dd, c["cls_res"] ** 2 + 1)
        dec.embedding_decoder = ed
        gps = nn.Module()
        gp16 = nn.Module()
        gp16.pos_conv = nn.Conv2d(2, c["gp_dim"], 1)
        setattr(gps, "16", gp16)
        dec.gps = gps
        proj = nn.Module()
        refiner = nn.Module()
        for (s, cin, cout, demb, rad, hb, dw) in c["scales"]:
            setattr(proj, s, nn.Sequential(nn.Conv2d(cin, cout, 1), nn.BatchNorm2d(cout)))
            corr = (2 * rad + 1) ** 2 if rad else 0
            in_dim = 2 * cout + demb + corr
            hid = in_dim if dw else max(in_dim, 24)
            rb = nn.Module()
            rb.disp_emb = nn.Conv2d(2, demb, 1)

            def mkblock(ci, co, dw_):
                g = ci if dw_ else 1
                return nn.Sequential(
                    nn.Conv2d(ci, co, 5, padding=2, groups=g),
                    nn.BatchNorm2d(co), nn.ReLU(), nn.Conv2d(co, co, 1),
                )

            rb.block1 = mkblock(in_dim, hid, dw)
            rb.hidden_blocks = nn.Sequential(*[mkblock(hid, hid, dw) for _ in range(hb)])
            rb.out_conv = nn.Conv2d(hid, 3, 1)
            setattr(refiner, s, rb)
        dec.proj = proj
        dec.conv_refiner = refiner
        self.decoder = dec

    # ---- decoder pieces
    def _gp(self, xa, xb):
        c = self.c
        B, C, h, w = xa.shape
        ys = torch.linspace(-1 + 1 / h, 1 - 1 / h, h)
        xs = torch.linspace(-1 + 1 / w, 1 - 1 / w, w)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        coords = torch.stack([gx, gy])[None].expand(B, 2, h, w)
        f = getattr(self.decoder.gps, "16").pos_conv(coords)
        N = h * w
        a = xa.flatten(2).transpose(1, 2)
        bt = xb.flatten(2).transpose(1, 2)
        fv = f.flatten(2).transpose(1, 2)

        def K(u, v):
            un = u / u.norm(dim=-1, keepdim=True).clamp_min(1e-6)
            vn = v / v.norm(dim=-1, keepdim=True).clamp_min(1e-6)
            return ((torch.einsum("bnd,bmd->bnm", un, vn) - 1.0) / c["kernel_T"]).exp()

        K_bb = K(bt, bt) + c["sigma_noise"] * torch.eye(N)
        mu = K(a, bt) @ torch.linalg.solve(K_bb, fv)
        return mu.transpose(1, 2).reshape(B, -1, h, w)

    def _match_decoder(self, x):
        c = self.c
        B, Dd, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)
        H = c["dec_heads"]
        for b in self.decoder.embedding_decoder.blocks:
            y = b.norm1(t)
            qkv = b.attn.qkv(y).reshape(B, -1, 3, H, Dd // H)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = torch.einsum("bnhd,bmhd->bhnm", q, k) * (Dd // H) ** -0.5
            y = torch.einsum("bhnm,bmhd->bnhd", a.softmax(-1), v).reshape(B, -1, Dd)
            t = t + b.attn.proj(y) * b.ls1.gamma
            y = b.norm2(t)
            t = t + b.mlp.fc2(F.gelu(b.mlp.fc1(y))) * b.ls2.gamma
        out = self.decoder.embedding_decoder.to_out(t)
        out = out.transpose(1, 2).reshape(B, -1, h, w)
        return out[:, :-1], out[:, -1:]

    def _cls_to_flow(self, logits):
        R = self.c["cls_res"]
        B, K, h, w = logits.shape
        cell = logits.argmax(1)
        cy, cx = cell // R, cell % R
        probs, coords = [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny = (cy + dy).clamp(0, R - 1)
                nx = (cx + dx).clamp(0, R - 1)
                idx = ny * R + nx
                probs.append(torch.gather(logits, 1, idx[:, None])[:, 0])
                coords.append(torch.stack(
                    [(nx + 0.5) / R * 2 - 1, (ny + 0.5) / R * 2 - 1], -1))
        pr = torch.stack(probs, -1).softmax(-1)
        co = torch.stack(coords, -2)
        return (pr[..., None] * co).sum(-2).permute(0, 3, 1, 2)

    def _refine(self, s, dw, hb, rad, xa, xb, flow):
        rb = getattr(self.decoder.conv_refiner, s)
        x_hat = F.grid_sample(xb, flow.permute(0, 2, 3, 1), align_corners=False)
        B, C, h, w = xa.shape
        ys = torch.linspace(-1 + 1 / h, 1 - 1 / h, h)
        xs = torch.linspace(-1 + 1 / w, 1 - 1 / w, w)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        grid = torch.stack([gx, gy])[None]
        demb = rb.disp_emb((flow - grid) * (40.0 / 32.0))
        parts = [xa, x_hat, demb]
        if rad:
            chans = []
            for dy in range(-rad, rad + 1):
                for dx in range(-rad, rad + 1):
                    off = torch.tensor([2 * dx / w, 2 * dy / h]).reshape(1, 2, 1, 1)
                    sb = F.grid_sample(xb, (flow + off).permute(0, 2, 3, 1),
                                       align_corners=False)
                    chans.append((xa * sb).mean(1) / np.sqrt(C))
            parts.append(torch.stack(chans, 1))
        d = torch.cat(parts, 1)
        d = rb.block1(d)
        d = rb.hidden_blocks(d)
        d = rb.out_conv(d)
        return d[:, :2], d[:, 2:3]

    def forward(self, xa, xb):
        c = self.c
        B = xa.shape[0]
        both = torch.cat([xa, xb], 0)
        vgg = self.encoder.cnn(both)
        coarse = self.dinov2(both)
        feats = {}
        for (s, cin, cout, demb, rad, hb, dw) in c["scales"]:
            src = coarse if s == "16" else vgg[int(s)]
            feats[s] = getattr(self.decoder.proj, s)(src)
        flow = cert = None
        for (s, cin, cout, demb, rad, hb, dw) in c["scales"]:
            fa, fb = feats[s][:B], feats[s][B:]
            h, w = fa.shape[2:]
            if s == "16":
                gp = self._gp(fa, fb)
                logits, cert = self._match_decoder(torch.cat([gp, fa], 1))
                flow = self._cls_to_flow(logits)
            else:
                flow = F.interpolate(flow, (h, w), mode="bilinear", align_corners=False)
                cert = F.interpolate(cert, (h, w), mode="bilinear", align_corners=False)
            disp, dcert = self._refine(s, dw, hb, rad, fa, fb, flow)
            flow = flow + disp * torch.tensor([2.0 / w, 2.0 / h]).reshape(1, 2, 1, 1)
            cert = cert + dcert
        return flow, cert[:, 0]


@pytest.mark.slow
def test_roma_torch_twin_parity():
    from mpsfm_tpu.extraction.nets.roma import RomaNet

    torch.manual_seed(0)
    twin = _TorchTwin(dict(TINY)).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for m in twin.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    R = TINY["resolution"]
    xa = torch.randn(1, 3, R, R)
    xb = torch.randn(1, 3, R, R)
    with torch.no_grad():
        t_flow, t_cert = twin(xa, xb)

    net = RomaNet(TINY)
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    dsd = {k[len("dinov2."):]: v for k, v in sd.items() if k.startswith("dinov2.")}
    msd = {k: v for k, v in sd.items() if not k.startswith("dinov2.")}
    net.params = net.params_from_torch_state_dict(msd, dsd)
    flow, cert = net._forward(
        net.params,
        jnp.asarray(xa.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(xb.numpy().transpose(0, 2, 3, 1)),
        (R, R),
    )
    np.testing.assert_allclose(
        np.asarray(flow), t_flow.numpy().transpose(0, 2, 3, 1), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(cert), t_cert.numpy(), atol=5e-4)


def test_roma_official_preset_and_matcher(tmp_path):
    """Full-size preset matches the official roma_outdoor dims; the
    matcher interface produces dense keypoint pairs and registers as
    get_dense_matcher('roma')."""
    from mpsfm_tpu.extraction.base import get_dense_matcher
    from mpsfm_tpu.extraction.nets.roma import MODEL_CONFIG, RomaMatcher, RomaNet

    assert MODEL_CONFIG["vit_dim"] == 1024 and MODEL_CONFIG["vit_depth"] == 24
    assert MODEL_CONFIG["gp_dim"] == 512 and MODEL_CONFIG["cls_res"] == 64
    assert MODEL_CONFIG["resolution"] == 672  # 14*8*6, reference roma.py:74
    assert [s[0] for s in MODEL_CONFIG["scales"]] == ["16", "8", "4", "2", "1"]

    src = RomaNet(TINY)
    src.init_random(1)
    for k in ("encoder.cnn.layers.0.weight", "encoder.cnn.layers.1.running_var",
              "decoder.embedding_decoder.to_out.weight",
              "decoder.gps.16.pos_conv.weight",
              "decoder.proj.16.0.weight",
              "decoder.conv_refiner.16.block1.0.weight",
              "dinov2.cls_token"):
        assert k in src.params, k
    # save matcher + dinov2 as the two separate official files
    m_sd = {k: torch.from_numpy(np.asarray(v).copy())
            for k, v in src.params.items() if not k.startswith("dinov2.")}
    d_sd = {k[len("dinov2."):]: torch.from_numpy(np.asarray(v).copy())
            for k, v in src.params.items() if k.startswith("dinov2.")}
    torch.save(m_sd, tmp_path / "roma_outdoor.pth")
    torch.save(d_sd, tmp_path / "dinov2_vitl14_pretrain.pth")

    m = get_dense_matcher("roma", {
        **TINY, "weights_path": str(tmp_path / "roma_outdoor.pth"),
        "dinov2_weights_path": str(tmp_path / "dinov2_vitl14_pretrain.pth"),
        "sample_thresh": 0.0, "nms_radius": 2,
    })
    assert isinstance(m, RomaMatcher)
    assert len(m.net.params) == len(src.params)
    rng = np.random.default_rng(0)
    imgA = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    imgB = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    out = m(imgA, imgB)
    assert out["keypoints0"].shape == out["keypoints1"].shape
    assert (out["keypoints0"][:, 0] < 80).all() and (out["keypoints0"][:, 1] < 60).all()
    assert (out["keypoints1"][:, 0] < 80).all() and (out["keypoints1"][:, 1] < 60).all()
