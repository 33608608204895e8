"""mpsfm_tpu — a TPU-native Structure-from-Motion framework.

A from-scratch reimagining of MP-SfM (CVPR 2025) for TPU hardware:
incremental SfM with monocular depth/normal priors, where all heavy
numerics (RANSAC, triangulation, bundle adjustment, bilateral normal
integration, depth-consistency checks, feature matching) run as batched
JAX/XLA device programs instead of the reference's pyceres/pycolmap C++
core (see /root/reference, surveyed in SURVEY.md).

Layout:
  geometry/     SE(3)/quaternion math, camera models, projection, triangulation
  estimators/   batched fixed-budget RANSAC (essential, absolute pose), two-view geometry
  ba/           batched Levenberg-Marquardt bundle adjustment w/ Schur complement
  scene/        flat reconstruction container, correspondence graph, priors
  integration/  bilateral normal integration (dense stencil CG solver)
  mapper/       incremental mapping controller (host logic driving device programs)
  extraction/   feature/matching/prior extraction (Flax models + classical fallbacks)
  parallel/     multi-device sharding of BA and matching (jax.sharding / shard_map)
  datasets/     scene parsers (intrinsics.yaml + image dirs)
  utils/        interpolation, IO (HDF5 caches, COLMAP format), misc
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/BA kernels contract small ill-conditioned matrices (AᵀA normal
# equations); TPU's default bf16 matmul passes break them. Make full-f32
# accumulation the package default — NN inference modules opt back into
# bf16 explicitly via jax.default_matmul_precision where it matters.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the incremental mapper compiles one
# program per shape bucket; caching across processes turns the multi-
# minute first-run compile tax into a one-time cost.
import os as _os

_cache_dir = _os.environ.get(
    "MPSFM_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/mpsfm_tpu/jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover — cache is best-effort
    pass
