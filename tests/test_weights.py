"""Weight-acquisition path (reference mpsfm/extraction/base_model.py:12-72).

Zero-egress tests: resolution order, the explicit-download gate, and the
loader-side maybe_resolve hook. No network is ever touched.
"""

import numpy as np
import pytest

from mpsfm_tpu.extraction.weights import (
    WEIGHT_REGISTRY,
    maybe_resolve,
    resolve_weights,
)


def test_registry_covers_model_zoo():
    # every model family of the reference zoo (SURVEY.md §2.4) has a
    # documented acquisition entry
    for name in (
        "superpoint", "lightglue", "netvlad", "metric3dv2-small",
        "metric3dv2-large", "metric3dv2-giant2", "depthpro",
        "depthanythingv2-vitl", "dsine", "skyseg", "mast3r",
        "roma-outdoor", "dinov2-vitl14",
    ):
        fname, url = WEIGHT_REGISTRY[name]
        assert url.startswith("https://")
        assert fname


def test_direct_path_passthrough(tmp_path):
    p = tmp_path / "some.pth"
    p.write_bytes(b"x")
    assert resolve_weights(str(p)) == p


def test_missing_refuses_download_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("MPSFM_ALLOW_DOWNLOAD", raising=False)
    monkeypatch.setenv("MPSFM_WEIGHTS_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError) as e:
        resolve_weights("lightglue")
    # the error documents the URL for out-of-band fetching
    assert "superpoint_lightglue.pth" in str(e.value)
    assert "https://" in str(e.value)


def test_env_dir_resolution(tmp_path, monkeypatch):
    monkeypatch.setenv("MPSFM_WEIGHTS_DIR", str(tmp_path))
    (tmp_path / "superpoint_lightglue.pth").write_bytes(b"x")
    assert resolve_weights("lightglue").name == "superpoint_lightglue.pth"


def test_models_dir_argument(tmp_path):
    (tmp_path / "depth_pro.pt").write_bytes(b"x")
    assert resolve_weights("depthpro", models_dir=tmp_path).name == "depth_pro.pt"


def test_maybe_resolve_tolerant(tmp_path, monkeypatch):
    monkeypatch.setenv("MPSFM_WEIGHTS_DIR", str(tmp_path))
    assert maybe_resolve(None) is None
    assert maybe_resolve("") == ""
    # unknown strings pass through for torch.load's own error
    assert maybe_resolve("/no/such/file.pth") == "/no/such/file.pth"
    (tmp_path / "dsine.pth").write_bytes(b"x")
    assert maybe_resolve("dsine").endswith("dsine.pth")


def test_unknown_name_lists_registry():
    with pytest.raises(KeyError) as e:
        resolve_weights("definitely-not-a-model")
    assert "lightglue" in str(e.value)


def test_lightglue_released_checkpoint_layout_accepted():
    """The released superpoint_lightglue.pth key layout (pre-rename
    self_attn.{i}.* / cross_attn.{i}.*, no input_proj) must pass the
    manifest check and convert (ADVICE r4 medium)."""
    from mpsfm_tpu.extraction.manifest import check_state_dict, load_manifest
    from mpsfm_tpu.extraction.matchers.lightglue import LightGlue

    man = load_manifest("lightglue")
    released = {}
    for k, shape in man.items():
        if k.startswith("input_proj."):
            continue  # nn.Identity in the released 256->256 checkpoint
        for i in range(9):
            for new, old in (
                (f"transformers.{i}.self_attn.", f"self_attn.{i}."),
                (f"transformers.{i}.cross_attn.", f"cross_attn.{i}."),
            ):
                if k.startswith(new):
                    k = old + k[len(new):]
        released[k] = np.zeros(shape, np.float32)
    norm = LightGlue.normalize_torch_state_dict(released)
    check_state_dict(norm, "lightglue")  # must not raise
    params = LightGlue.params_from_torch_state_dict(released)
    assert np.allclose(np.asarray(params["input_proj"]["w"]), np.eye(256))
