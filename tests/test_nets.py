"""Architecture + converter tests for the Flax model zoo (nets/)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu():
    jax.config.update("jax_platforms", "cpu")


def test_vit_forward_shapes():
    from mpsfm_tpu.extraction.nets.vit import ViT

    net = ViT(dim=64, depth=4, num_heads=2, patch=16, hooks=(0, 1, 2, 3), pos_grid=4)
    x = jnp.zeros((2, 64, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert len(feats) == 4
    for f in feats:
        assert f.shape == (2, 4, 6, 64)


def test_vit_torch_parity():
    """The converter + architecture reproduce a torch ViT forward
    bit-near-exactly (the shared trunk of the reference's heavy
    backends)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    D, H, P, depth = 32, 2, 8, 2
    side = 3  # pos grid

    LN = lambda d: tnn.LayerNorm(d, eps=1e-6)  # timm ViT convention

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = LN(D)
            self.attn = tnn.Module()
            self.attn.qkv = tnn.Linear(D, 3 * D)
            self.attn.proj = tnn.Linear(D, D)
            self.norm2 = LN(D)
            self.mlp = tnn.Module()
            self.mlp.fc1 = tnn.Linear(D, 4 * D)
            self.mlp.fc2 = tnn.Linear(4 * D, D)

        def forward(self, x):
            B, N, _ = x.shape
            y = self.norm1(x)
            qkv = self.attn.qkv(y).reshape(B, N, 3, H, D // H)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = torch.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D // H)
            a = torch.softmax(a, dim=-1)
            y = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, D)
            x = x + self.attn.proj(y)
            y = self.norm2(x)
            return x + self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(y)))

    class TViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = tnn.Module()
            self.patch_embed.proj = tnn.Conv2d(3, D, P, stride=P)
            self.pos_embed = tnn.Parameter(torch.randn(1, side * side + 1, D) * 0.02)
            self.cls_token = tnn.Parameter(torch.randn(1, 1, D) * 0.02)
            self.blocks = tnn.ModuleList([TBlock() for _ in range(depth)])
            self.norm = LN(D)

        def forward(self, x):  # (B,3,Hh,Ww)
            y = self.patch_embed.proj(x)
            B, _, h, w = y.shape
            y = y.flatten(2).transpose(1, 2)
            pos = self.pos_embed[:, 1:].reshape(1, side, side, D).permute(0, 3, 1, 2)
            pos = tnn.functional.interpolate(pos, (h, w), mode="bilinear", align_corners=False)
            y = y + pos.flatten(2).transpose(1, 2)
            y = torch.cat([self.cls_token.expand(B, 1, D), y], 1)
            for blk in self.blocks:
                y = blk(y)
            return self.norm(y[:, 1:]).reshape(B, h, w, D)

    torch.manual_seed(0)
    tnet = TViT().eval()
    x = torch.rand(1, 3, 24, 24)
    with torch.no_grad():
        ref = tnet(x).numpy()

    from mpsfm_tpu.extraction.nets.vit import ViT, vit_params_from_torch

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = vit_params_from_torch(sd, depth=depth)
    net = ViT(dim=D, depth=depth, num_heads=H, patch=P, hooks=(depth - 1,), pos_grid=side)
    out = net.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))[0]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.slow
def test_mono_vit_backend_smoke():
    from mpsfm_tpu.extraction.priors import get_prior_backend

    be = get_prior_backend("vit_mono", {"dim": 32, "depth_blocks": 4, "num_heads": 2, "feat": 16})
    rgb = (np.random.default_rng(0).random((40, 56, 3)) * 255).astype(np.uint8)
    out = be(rgb, intrinsics=(300.0, 300.0, 28.0, 20.0))
    assert out["depth"].shape == (40, 56)
    assert out["normals"].shape == (40, 56, 3)
    assert np.all(out["depth"] >= 0)
    assert np.all(np.isfinite(out["depth_variance"]))
    n = np.linalg.norm(out["normals"], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


@pytest.mark.slow
def test_mono_vit_flip_consistency():
    from mpsfm_tpu.extraction.nets.mono import ViTMonoBackend

    be = ViTMonoBackend({"dim": 32, "depth_blocks": 4, "num_heads": 2, "feat": 16, "flip_consistency": True})
    rgb = (np.random.default_rng(1).random((32, 32, 3)) * 255).astype(np.uint8)
    out = be(rgb)
    assert "depth2" in out and out["depth2"].shape == out["depth"].shape
    assert "normals2" in out


@pytest.mark.slow
def test_mono_torch_converter_roundtrip():
    """mono_params_from_torch produces a loadable tree (schema parity)."""
    torch = pytest.importorskip("torch")
    from mpsfm_tpu.extraction.nets.mono import MonoViT, mono_params_from_torch

    net = MonoViT(dim=32, depth_blocks=2, num_heads=2, feat=16)
    x = jnp.zeros((1, 32, 32, 3))
    ref_params = net.init(jax.random.PRNGKey(0), x)

    # synthesize a torch state dict with the documented naming + shapes
    sd = {}

    def add_from(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                if set(v) == {"kernel", "bias"} and np.ndim(v["kernel"]) == 4:
                    sd[name + ".weight"] = np.transpose(np.asarray(v["kernel"]), (3, 2, 0, 1))
                    sd[name + ".bias"] = np.asarray(v["bias"])
                elif set(v) == {"kernel", "bias"}:
                    sd[name + ".weight"] = np.asarray(v["kernel"]).T
                    sd[name + ".bias"] = np.asarray(v["bias"])
                elif set(v) == {"scale", "bias"}:
                    sd[name + ".weight"] = np.asarray(v["scale"])
                    sd[name + ".bias"] = np.asarray(v["bias"])
                else:
                    add_from(v, name)
            else:
                sd[name] = np.asarray(v)

    p = ref_params["params"]
    # trunk (timm naming)
    t = p["trunk"]
    sd["trunk.patch_embed.proj.weight"] = np.transpose(np.asarray(t["patch_embed"]["kernel"]), (3, 2, 0, 1))
    sd["trunk.patch_embed.proj.bias"] = np.asarray(t["patch_embed"]["bias"])
    g = np.asarray(t["pos_embed"])
    sd["trunk.pos_embed"] = g.reshape(1, -1, g.shape[-1])
    sd["trunk.cls_token"] = np.asarray(t["cls_token"])
    sd["trunk.norm.weight"] = np.asarray(t["norm"]["scale"])
    sd["trunk.norm.bias"] = np.asarray(t["norm"]["bias"])
    for i in range(2):
        b = t[f"blocks_{i}"]
        for ln in ("norm1", "norm2"):
            sd[f"trunk.blocks.{i}.{ln}.weight"] = np.asarray(b[ln]["scale"])
            sd[f"trunk.blocks.{i}.{ln}.bias"] = np.asarray(b[ln]["bias"])
        sd[f"trunk.blocks.{i}.attn.qkv.weight"] = np.asarray(b["attn"]["qkv"]["kernel"]).T
        sd[f"trunk.blocks.{i}.attn.qkv.bias"] = np.asarray(b["attn"]["qkv"]["bias"])
        sd[f"trunk.blocks.{i}.attn.proj.weight"] = np.asarray(b["attn"]["proj"]["kernel"]).T
        sd[f"trunk.blocks.{i}.attn.proj.bias"] = np.asarray(b["attn"]["proj"]["bias"])
        sd[f"trunk.blocks.{i}.mlp.fc1.weight"] = np.asarray(b["mlp_fc1"]["kernel"]).T
        sd[f"trunk.blocks.{i}.mlp.fc1.bias"] = np.asarray(b["mlp_fc1"]["bias"])
        sd[f"trunk.blocks.{i}.mlp.fc2.weight"] = np.asarray(b["mlp_fc2"]["kernel"]).T
        sd[f"trunk.blocks.{i}.mlp.fc2.bias"] = np.asarray(b["mlp_fc2"]["bias"])
    add_from(p["decoder"], "decoder")
    add_from(p["depth_head"], "depth_head")
    add_from(p["normal_head"], "normal_head")
    add_from(p["conf_head"], "conf_head")

    conv = mono_params_from_torch(sd, depth=2)
    # converted tree loads + forward matches the original params
    out_ref = net.apply(ref_params, jnp.ones((1, 32, 32, 3)) * 0.5)
    out_conv = net.apply(jax.tree_util.tree_map(jnp.asarray, conv), jnp.ones((1, 32, 32, 3)) * 0.5)
    np.testing.assert_allclose(np.asarray(out_conv["depth"]), np.asarray(out_ref["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_conv["normals"]), np.asarray(out_ref["normals"]), atol=1e-5)


@pytest.mark.slow
def test_two_view_matcher_smoke():
    from mpsfm_tpu.extraction.nets.two_view import TwoViewMatcher

    m = TwoViewMatcher({"dim": 32, "enc_depth": 2, "dec_depth": 2, "num_heads": 2, "feat": 16, "desc_dim": 8})
    rng = np.random.default_rng(0)
    imA = (rng.random((48, 64)) * 255).astype(np.uint8)
    imB = np.roll(imA, 4, axis=1)
    out = m(imA, imB)
    assert out["keypoints0"].shape[1] == 2
    assert len(out["keypoints0"]) == len(out["keypoints1"]) == len(out["certainty"])
    # depth mode surface
    pd = m.pair_depth(imA, imB)
    assert pd["0"]["depth"].shape == (48, 64)
    assert np.all(pd["0"]["depth"] > 0)
    assert np.all(pd["1"]["variance"] > 0)


@pytest.mark.slow
def test_warp_matcher_smoke():
    from mpsfm_tpu.extraction.nets.warp import WarpMatcher

    m = WarpMatcher({"feat": 16, "certainty_threshold": -1.0})
    rng = np.random.default_rng(0)
    imA = (rng.random((48, 64)) * 255).astype(np.uint8)
    imB = np.roll(imA, 4, axis=1)
    out = m(imA, imB)
    assert len(out["keypoints0"]) > 0
    assert out["keypoints0"].shape == out["keypoints1"].shape


def test_dense_matcher_registry():
    from mpsfm_tpu.extraction.base import get_dense_matcher
    from mpsfm_tpu.extraction.matchers.dense_ncc import DenseNCCMatcher

    assert isinstance(get_dense_matcher("dense_ncc", {}), DenseNCCMatcher)
    m = get_dense_matcher("two_view", {"dim": 32, "enc_depth": 2, "dec_depth": 2, "num_heads": 2, "feat": 16, "desc_dim": 8})
    assert m.__class__.__name__ == "TwoViewMatcher"
    assert get_dense_matcher("roma_class", {"feat": 16}).__class__.__name__ == "WarpMatcher"
    import pytest as _pt

    with _pt.raises(ValueError):
        get_dense_matcher("nope", {})
