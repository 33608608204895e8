"""Checkpoint acquisition: the reference's weight auto-download path
(mpsfm/extraction/base_model.py:12-72: per-model ``download_url`` +
``download_method`` gdown/wget into ``local/weights``), rebuilt as one
registry + resolver.

Zero-egress environments: resolution is always attempted first (explicit
path, $MPSFM_WEIGHTS_DIR, ./local/weights); the network is only touched
when downloads are explicitly enabled (MPSFM_ALLOW_DOWNLOAD=1 or
``allow_download=True``), and failures raise with the documented URL so
a user can fetch the file out of band.

URL sources (the reference's own registry):
  metric3dv2     mpsfm/extraction/.../depth/metric3dv2.py:32-37
  depthpro       .../depth/depthpro.py:21-24
  depthanything  .../depth/depthanythingv2.py:28-34
  dsine          .../normals/dsine.py:34-35 (Google Drive id -> gdown)
  skyseg         .../mask/models/skyseg.py:182-184 (Google Drive id)
  mast3r         mpsfm/extraction/pairwise/models/mast3r.py:211-218
  roma (+dinov2) mpsfm/extraction/pairwise/models/roma.py:28-44
  netvlad        mpsfm/extraction/imagewise/features/models/netvlad.py:48-52
  superpoint / lightglue: the upstream releases the reference wraps via
  SuperGluePretrainedNetwork / the lightglue pip package.
"""

from __future__ import annotations

import os
from pathlib import Path

_GDRIVE = "https://drive.google.com/uc?export=download&id="

# name -> (filename, url). Google-Drive entries use the uc?export form
# (the reference shells out to gdown with the bare id).
WEIGHT_REGISTRY: dict[str, tuple[str, str]] = {
    "superpoint": (
        "superpoint_v1.pth",
        "https://github.com/magicleap/SuperGluePretrainedNetwork/raw/master/models/weights/superpoint_v1.pth",
    ),
    "lightglue": (
        "superpoint_lightglue.pth",
        "https://github.com/cvg/LightGlue/releases/download/v0.1_arxiv/superpoint_lightglue.pth",
    ),
    "netvlad": (
        "Pitts30K_struct.mat",
        "https://cvg-data.inf.ethz.ch/hloc/netvlad/Pitts30K_struct.mat",
    ),
    "metric3dv2-small": (
        "metric_depth_vit_small_800k.pth",
        "https://huggingface.co/JUGGHM/Metric3D/resolve/main/metric_depth_vit_small_800k.pth",
    ),
    "metric3dv2-large": (
        "metric_depth_vit_large_800k.pth",
        "https://huggingface.co/JUGGHM/Metric3D/resolve/main/metric_depth_vit_large_800k.pth",
    ),
    "metric3dv2-giant2": (
        "metric_depth_vit_giant2_800k.pth",
        "https://huggingface.co/JUGGHM/Metric3D/resolve/main/metric_depth_vit_giant2_800k.pth",
    ),
    "depthpro": (
        "depth_pro.pt",
        "https://ml-site.cdn-apple.com/models/depth-pro/depth_pro.pt",
    ),
    "depthanythingv2-vitl": (
        "depth_anything_v2_metric_vkitti_vitl.pth",
        "https://huggingface.co/depth-anything/Depth-Anything-V2-Metric-VKITTI-Large/resolve/main/depth_anything_v2_metric_vkitti_vitl.pth",
    ),
    "dsine": ("dsine.pth", _GDRIVE + "1u8TdKXkR7-0zzRRcx-3x3rPN7gvAAM9N"),
    "skyseg": ("skyseg.onnx", _GDRIVE + "1jJpcRXAHaTR1zk4xD1kVYXtnO1-C982K"),
    "mast3r": (
        "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth",
        "https://download.europe.naverlabs.com/ComputerVision/MASt3R/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth",
    ),
    "roma-outdoor": (
        "roma_outdoor.pth",
        "https://github.com/Parskatt/storage/releases/download/roma/roma_outdoor.pth",
    ),
    "dinov2-vitl14": (
        "dinov2_vitl14_pretrain.pth",
        "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/dinov2_vitl14_pretrain.pth",
    ),
}


def default_models_dir() -> Path:
    env = os.environ.get("MPSFM_WEIGHTS_DIR")
    if env:
        return Path(env)
    return Path.cwd() / "local" / "weights"


def resolve_weights(
    name: str,
    models_dir: str | os.PathLike | None = None,
    allow_download: bool | None = None,
) -> Path:
    """Return the local checkpoint path for a registry ``name`` (or a
    direct filesystem path). Downloads only when explicitly enabled."""
    p = Path(name)
    if p.exists():
        return p
    if name not in WEIGHT_REGISTRY:
        raise KeyError(
            f"'{name}' is neither an existing file nor a registered weight "
            f"name; known: {sorted(WEIGHT_REGISTRY)}"
        )
    fname, url = WEIGHT_REGISTRY[name]
    search = [Path(models_dir)] if models_dir else []
    search.append(default_models_dir())
    for d in search:
        cand = d / fname
        if cand.exists():
            return cand
    if allow_download is None:
        allow_download = os.environ.get("MPSFM_ALLOW_DOWNLOAD") == "1"
    target = (Path(models_dir) if models_dir else default_models_dir()) / fname
    if not allow_download:
        raise FileNotFoundError(
            f"checkpoint '{fname}' for '{name}' not found in {', '.join(map(str, search))}. "
            f"Set MPSFM_ALLOW_DOWNLOAD=1 to fetch it, or download it manually:\n"
            f"  curl -L -o {target} '{url}'"
        )
    return _download(url, target)


def _download(url: str, target: Path) -> Path:
    import urllib.request

    target.parent.mkdir(parents=True, exist_ok=True)
    tmp = target.with_suffix(target.suffix + ".part")
    print(f"downloading {url} -> {target}")
    urllib.request.urlretrieve(url, tmp)  # noqa: S310 — explicit opt-in above
    os.replace(tmp, target)
    return target


def maybe_resolve(weights_path):
    """Loader-side hook: a ``weights_path`` conf value may be a direct
    path OR a registry name ('lightglue', 'metric3dv2-giant2', ...).
    Unknown strings pass through unchanged so torch.load raises its own
    clear error for genuinely bad paths."""
    if not weights_path:
        return weights_path
    try:
        return str(resolve_weights(str(weights_path)))
    except (KeyError, FileNotFoundError):
        return str(weights_path)


def main(argv=None):
    """CLI: ``python -m mpsfm_tpu.extraction.weights [name ...]`` —
    resolve (and with MPSFM_ALLOW_DOWNLOAD=1, fetch) checkpoints; with no
    names, list the registry."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if not args:
        width = max(len(k) for k in WEIGHT_REGISTRY)
        for k, (fname, url) in sorted(WEIGHT_REGISTRY.items()):
            print(f"{k:<{width}}  {fname}  {url}")
        return 0
    rc = 0
    for name in args:
        try:
            print(resolve_weights(name))
        except (KeyError, FileNotFoundError, OSError) as e:
            print(f"{name}: {e}")
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
