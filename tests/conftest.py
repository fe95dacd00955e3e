"""Test configuration: CPU backend with a virtual 8-device mesh.

Tests run on CPU (the TPU is reserved for benchmarks) with:
  * 8 virtual devices so multi-chip sharding paths are exercised;
  * XLA backend optimization disabled — XLA:CPU's LLVM pipeline has
    pathological compile times on some scatter/gather graphs (order of
    minutes for our step function); the TPU compiler is unaffected;
  * a persistent compilation cache to keep repeat runs fast.
"""

import os

# Force CPU even when the ambient environment selects a TPU backend
# (the TPU is reserved for benchmarks; tests must be hermetic).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=0"
)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/miniworld_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
