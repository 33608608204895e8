"""Generate the pinned checkpoint manifests (mpsfm_tpu/extraction/
manifests/*.json) for every external-net port at its OFFICIAL
configuration.

For the big nets the manifest is derived from the port's `init_random`,
which constructs params under the official checkpoint naming (the same
key space `params_from_torch_state_dict` produces from a real file); the
classic small nets (superpoint / lightglue / netvlad) have closed-form
builders in manifest.py. depth_pro derives its manifest from the actual
HF `DepthProForDepthEstimation` state dict (the converter's input space).

Run: python scripts/gen_manifests.py       (~1-2 min, a few GB transient)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from mpsfm_tpu.extraction.manifest import (  # noqa: E402
    BUILTIN,
    manifest_from_params,
    save_manifest,
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    written = []

    for name, builder in BUILTIN.items():
        written.append(save_manifest(name, builder()))

    # Metric3Dv2 family — official naming from init_random
    from mpsfm_tpu.extraction.nets.metric3d import Metric3Dv2

    for enc, tag in (("vit_small_reg", "small"), ("vit_large_reg", "large"),
                     ("vit_giant2_reg", "giant2")):
        net = Metric3Dv2({"encoder": enc})
        net.init_random(0)
        written.append(save_manifest(f"metric3dv2-{tag}", manifest_from_params(net.params)))
        net.params = None

    # DSINE (v02_kappa geffnet EfficientNet-B5 layout)
    from mpsfm_tpu.extraction.nets.dsine import DSINE

    net = DSINE({})
    net.init_random(0)
    written.append(save_manifest("dsine", manifest_from_params(net.params)))

    # DepthAnythingV2 metric vitl
    from mpsfm_tpu.extraction.nets.depth_anything import DepthAnythingV2

    net = DepthAnythingV2()
    net.init_random(0)
    written.append(save_manifest("depthanythingv2-vitl", manifest_from_params(net.params)))

    # MASt3R ViT-L dual decoder
    from mpsfm_tpu.extraction.nets.mast3r import Mast3rNet

    net = Mast3rNet()
    net.init_random(0)
    written.append(save_manifest("mast3r", manifest_from_params(net.params)))

    # RoMa outdoor (+ separate dinov2_vitl14 file)
    from mpsfm_tpu.extraction.nets.roma import RomaNet

    net = RomaNet()
    net.init_random(0)
    man = manifest_from_params(net.params)
    written.append(save_manifest("roma", man))
    written.append(
        save_manifest("roma-outdoor", {k: v for k, v in man.items() if not k.startswith("dinov2.")})
    )
    written.append(
        save_manifest(
            "roma-dinov2",
            {k[len("dinov2."):]: v for k, v in man.items() if k.startswith("dinov2.")},
        )
    )

    # DepthPro — manifest in the HF state-dict space the converter reads
    from mpsfm_tpu.extraction.nets.depth_pro import DepthPro

    net = DepthPro()
    tmodel = net.init_random(0)
    sd = tmodel.state_dict()
    written.append(
        save_manifest("depthpro", {k: list(v.shape) for k, v in sd.items()})
    )

    for p in written:
        n = len(__import__("json").load(open(p)))
        print(f"{p.name}: {n} keys")


if __name__ == "__main__":
    main()
