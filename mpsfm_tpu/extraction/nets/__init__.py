"""Neural network architectures (Flax) for the extraction model zoo.

TPU-native re-implementations of the architectures behind the
reference's extraction backends (SURVEY.md §2.4): a shared ViT trunk
(Metric3Dv2 / MASt3R / DINOv2-class encoders), a DPT dense-prediction
decoder, a monocular depth+normal estimator, a two-view cross-attention
matcher (MASt3R-class) and a dense warp regressor (RoMa-class).

Weights: checkpoint converters map torch state dicts (timm-style ViT
naming) to these modules; random initialization is used when no
checkpoint is available (architecture-parity smoke paths).
"""

from mpsfm_tpu.extraction.nets.vit import ViT, vit_params_from_torch
from mpsfm_tpu.extraction.nets.dpt import DPTDecoder

__all__ = ["ViT", "vit_params_from_torch", "DPTDecoder"]
