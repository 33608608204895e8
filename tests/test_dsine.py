"""DSINE exact-port parity: JAX forward vs an independent torch twin built
in-test from the public spec (geffnet TF-EfficientNet encoder + ray-
conditioned rotation-refinement decoder), under the official checkpoint
naming (``encoder.original_model.*`` / ``decoder.*`` as in ``dsine.pth``).

Reference surface: mpsfm/extraction/imagewise/geometry/models/normals/
dsine.py:26-141 (wrapper semantics) + baegwangbin/DSINE v02_kappa.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

TINY = dict(
    stages=((1, 8, 1, 1, 3), (6, 12, 1, 2, 3), (6, 16, 1, 2, 5),
            (6, 16, 1, 2, 3), (6, 24, 2, 2, 5)),
    stem=8, head=32, decoder_nf=16, feature_dim=8, hidden_dim=8, iters=2,
)


def _same_pad(x, k, s):
    """TF 'SAME' padding (asymmetric right/bottom) for stride-s conv."""
    ih, iw = x.shape[-2:]
    ph = max((int(np.ceil(ih / s)) - 1) * s + k - ih, 0)
    pw = max((int(np.ceil(iw / s)) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class _ConvSame(nn.Conv2d):
    def forward(self, x):
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _TorchEncoder(nn.Module):
    """geffnet-named TF-EfficientNet (inference mode)."""

    def __init__(self, c):
        super().__init__()
        self.c = c
        om = nn.Module()
        om.conv_stem = _ConvSame(3, c["stem"], 3, stride=2, bias=False)
        om.bn1 = nn.BatchNorm2d(c["stem"], eps=1e-3)
        om.blocks = nn.ModuleList()
        cin = c["stem"]
        for (exp, ch, rep, stride, k) in c["stages"]:
            stage = nn.ModuleList()
            for bi in range(rep):
                st = stride if bi == 0 else 1
                b = nn.Module()
                mid = cin * exp
                se = max(1, int(cin * 0.25))
                if exp == 1:
                    b.conv_dw = _ConvSame(cin, cin, k, stride=st, groups=cin, bias=False)
                    b.bn1 = nn.BatchNorm2d(cin, eps=1e-3)
                    b.se = nn.Module()
                    b.se.conv_reduce = nn.Conv2d(cin, se, 1)
                    b.se.conv_expand = nn.Conv2d(se, cin, 1)
                    b.conv_pw = nn.Conv2d(cin, ch, 1, bias=False)
                    b.bn2 = nn.BatchNorm2d(ch, eps=1e-3)
                else:
                    b.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
                    b.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
                    b.conv_dw = _ConvSame(mid, mid, k, stride=st, groups=mid, bias=False)
                    b.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
                    b.se = nn.Module()
                    b.se.conv_reduce = nn.Conv2d(mid, se, 1)
                    b.se.conv_expand = nn.Conv2d(se, mid, 1)
                    b.conv_pwl = nn.Conv2d(mid, ch, 1, bias=False)
                    b.bn3 = nn.BatchNorm2d(ch, eps=1e-3)
                b.exp, b.st, b.cin, b.ch = exp, st, cin, ch
                stage.append(b)
                cin = ch
            om.blocks.append(stage)
        om.conv_head = nn.Conv2d(cin, c["head"], 1, bias=False)
        om.bn2 = nn.BatchNorm2d(c["head"], eps=1e-3)
        self.original_model = om

    def forward(self, x):
        om = self.original_model
        y = F.silu(om.bn1(om.conv_stem(x)))
        feats = {}
        scale = 2
        for stage, (exp, ch, rep, stride, k) in zip(om.blocks, self.c["stages"]):
            for b in stage:
                inp = y
                if b.exp == 1:
                    y = F.silu(b.bn1(b.conv_dw(y)))
                    s = y.mean((2, 3), keepdim=True)
                    s = torch.sigmoid(b.se.conv_expand(F.silu(b.se.conv_reduce(s))))
                    y = y * s
                    y = b.bn2(b.conv_pw(y))
                else:
                    y = F.silu(b.bn1(b.conv_pw(y)))
                    y = F.silu(b.bn2(b.conv_dw(y)))
                    s = y.mean((2, 3), keepdim=True)
                    s = torch.sigmoid(b.se.conv_expand(F.silu(b.se.conv_reduce(s))))
                    y = y * s
                    y = b.bn3(b.conv_pwl(y))
                if b.st == 1 and inp.shape == y.shape:
                    y = y + inp
            scale *= stride
            feats[scale] = y
        head = F.silu(om.bn2(om.conv_head(y)))
        return feats.get(8), feats.get(16), head


class _TorchDecoder(nn.Module):
    def __init__(self, c, skips):
        super().__init__()
        self.c = c
        nf, fd, hd = c["decoder_nf"], c["feature_dim"], c["hidden_dim"]
        self.conv2 = nn.Conv2d(c["head"], nf, 1)
        widths = (nf // 2, nf // 4)
        cin = nf
        for i, cout in enumerate(widths):
            u = nn.Module()
            u.convA = nn.Conv2d(cin + skips[i], cout, 3, padding=1)
            u.convB = nn.Conv2d(cout, cout, 3, padding=1)
            setattr(self, f"up{i+1}", u)
            cin = cout
        self.feature_head = nn.Module()
        self.feature_head.conv1 = nn.Conv2d(cin + 3, fd, 3, padding=1)
        self.feature_head.conv2 = nn.Conv2d(fd, fd, 1)
        self.init_head = nn.Conv2d(fd, 4, 3, padding=1)
        self.hidden_init = nn.Conv2d(fd, hd, 3, padding=1)
        self.gru = nn.Module()
        for g in ("convz", "convr", "convq"):
            setattr(self.gru, g, nn.Conv2d(hd + fd + 4 + 3, hd, 3, padding=1))
        self.rot_head = nn.Module()
        self.rot_head.conv1 = nn.Conv2d(hd, hd, 3, padding=1)
        self.rot_head.conv2 = nn.Conv2d(hd, 4, 3, padding=1)
        self.mask_head = nn.Module()
        self.mask_head.conv1 = nn.Conv2d(hd, 2 * hd, 3, padding=1)
        self.mask_head.conv2 = nn.Conv2d(2 * hd, 9 * 64, 1)

    @staticmethod
    def _rotate(n, aa):
        theta = aa.norm(dim=1, keepdim=True)
        axis = aa / theta.clamp_min(1e-8)
        cos, sin = torch.cos(theta), torch.sin(theta)
        return (n * cos + torch.cross(axis, n, dim=1) * sin
                + axis * (axis * n).sum(1, keepdim=True) * (1 - cos))

    @staticmethod
    def _convex_upsample(x, mask, f=8):
        B, C, h, w = x.shape
        mask = mask.view(B, 9, f * f, h, w).softmax(1)
        neigh = F.unfold(x, 3, padding=1).view(B, C, 9, h, w)
        up = torch.einsum("bkfhw,bckhw->bcfhw", mask, neigh)
        up = up.view(B, C, f, f, h, w).permute(0, 1, 4, 2, 5, 3)
        return up.reshape(B, C, h * f, w * f)

    def forward(self, f8, f16, head, rays):
        y = self.conv2(head)
        for i, skip in enumerate((f16, f8)):
            u = getattr(self, f"up{i+1}")
            y = F.interpolate(y, skip.shape[2:], mode="bilinear", align_corners=False)
            y = torch.cat([y, skip], 1)
            y = F.leaky_relu(u.convA(y), 0.2)
            y = F.leaky_relu(u.convB(y), 0.2)
        y = torch.cat([y, rays], 1)
        f = F.relu(self.feature_head.conv1(y))
        f = self.feature_head.conv2(f)
        pred = self.init_head(f)
        n = pred[:, :3]
        n = n / n.norm(dim=1, keepdim=True).clamp_min(1e-6)
        kap = pred[:, 3:4]
        h = torch.tanh(self.hidden_init(f))
        for _ in range(self.c["iters"]):
            inp = torch.cat([f, n, kap, rays], 1)
            hx = torch.cat([h, inp], 1)
            z = torch.sigmoid(self.gru.convz(hx))
            r = torch.sigmoid(self.gru.convr(hx))
            q = torch.tanh(self.gru.convq(torch.cat([r * h, inp], 1)))
            h = (1 - z) * h + z * q
            d = F.relu(self.rot_head.conv1(h))
            d = self.rot_head.conv2(d)
            n = self._rotate(n, d[:, :3])
            n = n / n.norm(dim=1, keepdim=True).clamp_min(1e-6)
            kap = kap + d[:, 3:4]
        mask = self.mask_head.conv2(F.relu(self.mask_head.conv1(h)))
        full = self._convex_upsample(torch.cat([n, kap], 1), mask)
        normal = full[:, :3]
        normal = normal / normal.norm(dim=1, keepdim=True).clamp_min(1e-6)
        kappa = F.elu(full[:, 3]) + 1.0
        return normal, kappa


class _TorchTwin(nn.Module):
    def __init__(self, c, skips):
        super().__init__()
        self.encoder = _TorchEncoder(c)
        self.decoder = _TorchDecoder(c, skips)

    def forward(self, x, rays):
        f8, f16, head = self.encoder(x)
        return self.decoder(f8, f16, head, rays)


@pytest.mark.slow
def test_dsine_torch_twin_parity():
    from mpsfm_tpu.extraction.nets.dsine import DSINE

    net = DSINE(TINY)
    skips = net._skip_channels()
    torch.manual_seed(0)
    twin = _TorchTwin(dict(TINY), skips).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for m in twin.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    x = torch.randn(2, 3, 64, 96)
    rays = torch.randn(2, 3, 8, 12)
    rays = rays / rays.norm(dim=1, keepdim=True)
    with torch.no_grad():
        t_normal, t_kappa = twin(x, rays)

    net.params = net.params_from_torch_state_dict(
        {k: v.numpy() for k, v in twin.state_dict().items()}
    )
    normal, kappa = net._forward(
        net.params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(rays.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(normal), t_normal.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(kappa), t_kappa.numpy(), atol=2e-4)


def test_dsine_b5_preset_shapes():
    """The default (no-override) config is the real TF-EfficientNet-B5
    ladder: stem 24, stage channels 24/40/64/128/176/304/512, head 2048
    — the geffnet tf_efficientnet_b5_ap dimensions the official dsine.pth
    checkpoint requires."""
    from mpsfm_tpu.extraction.nets.dsine import efficientnet_stages

    stages = efficientnet_stages()
    assert [s[1] for s in stages] == [24, 40, 64, 128, 176, 304, 512]
    assert [s[2] for s in stages] == [3, 5, 5, 7, 7, 9, 3]


def test_dsine_official_names_and_backend(tmp_path):
    """Checkpoint roundtrip under official names + NeuralDepthBackend
    routing for dsine-kappa(-fc); BNI coords + kappa variance."""
    from mpsfm_tpu.extraction.nets.dsine import DSINE
    from mpsfm_tpu.extraction.priors import NeuralDepthBackend, _DSINEBackend

    src = DSINE(TINY)
    src.init_random(1)
    for k in ("encoder.original_model.conv_stem.weight",
              "encoder.original_model.blocks.1.0.conv_pwl.weight",
              "encoder.original_model.bn2.running_var",
              "decoder.gru.convz.weight", "decoder.rot_head.conv2.weight"):
        assert k in src.params
    ckpt = tmp_path / "dsine.pth"
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in src.params.items()}},
        ckpt,
    )
    be = NeuralDepthBackend("dsine-kappa", {**TINY, "weights_path": str(ckpt)})
    assert isinstance(be.backend, _DSINEBackend)
    rgb = (np.random.default_rng(1).random((50, 70, 3)) * 255).astype(np.uint8)
    out = be(rgb, intrinsics=(120.0, 130.0, 35.0, 25.0))
    assert out["normals"].shape == (50, 70, 3)
    np.testing.assert_allclose(
        np.linalg.norm(out["normals"], axis=-1), 1.0, atol=1e-4
    )
    assert (out["normals_variance"] > 0).all()
    assert "depth" not in out  # normals-only model (reference return_types)

    be2 = NeuralDepthBackend("dsine-kappa-fc", {**TINY, "weights_path": str(ckpt)})
    out2 = be2(rgb, intrinsics=(120.0, 130.0, 35.0, 25.0))
    assert "normals2" in out2 and "normals2_variance" in out2


def test_dsine_normals_override_in_facade(tmp_path):
    """extract_mono with a dedicated normals backend overrides the
    depth-derived normals (reference: DSINE as the normals model beside a
    depth model, configs/defaults/DSINE-kappa.yaml)."""
    import h5py

    from mpsfm_tpu.extraction.nets.dsine import DSINE
    from mpsfm_tpu.extraction.priors import get_prior_backend

    src = DSINE(TINY)
    src.init_random(2)
    ckpt = tmp_path / "dsine.pth"
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in src.params.items()}, ckpt
    )
    be = get_prior_backend("dsine-kappa", {**TINY, "weights_path": str(ckpt)})
    rgb = (np.random.default_rng(0).random((40, 60, 3)) * 255).astype(np.uint8)
    out = be(rgb, intrinsics=(100.0, 100.0, 30.0, 20.0))
    assert out["normals"].shape == (40, 60, 3)
