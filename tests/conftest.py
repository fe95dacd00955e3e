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

# The env var alone is NOT sufficient here: the machine's sitecustomize
# registers the TPU plugin and force-sets jax_platforms="axon,cpu" via
# jax.config.update, which overrides JAX_PLATFORMS — so "CPU" test runs
# silently grab the TPU whenever the chip is free. Re-asserting the
# config AFTER import wins deterministically (and restores the 8
# virtual host devices).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/miniworld_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
