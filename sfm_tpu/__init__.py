"""sfm_tpu: TPU-native visual odometry + structure-from-motion engine.

Capability surface of dphoyes/OpenCL-Structure-from-Motion (libviso2),
redesigned for JAX/XLA/Pallas/pjit. See SURVEY.md for the layer map.
"""

import os

import jax

# f32-faithful matmuls: the TPU default truncates f32 matmul operands to
# bf16, which corrupts geometry (pixel coordinates are not bf16-exact) and
# stalls Gauss-Newton convergence. "highest" uses the 3-pass bf16 algorithm,
# which is exact for f32 mantissas; the engine's only large matmuls are
# one-hot permutations and bin sums, so the cost is negligible.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: frame programs are large and per-resolution;
# caching makes repeat runs (and the bench harness) start in seconds.
_cache_dir = os.environ.get("SFM_TPU_XLA_CACHE",
                            os.path.expanduser("~/.cache/sfm_tpu_xla"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without these options
    pass

__version__ = "0.1.0"
