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


# The persistent compilation cache is DISABLED here: on this machine
# (TPU plugin hooked into every process via sitecustomize) cache writes
# of the big test executables SIGABRT and reads of entries written by a
# previous process SIGSEGV — both deep in jax's executable
# (de)serialization, reproducibly, even on a freshly wiped cache dir.
# Cold compiles cost a few extra minutes per full run; a suite that
# segfaults at 59% costs more.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    XLA:CPU segfaults in backend_compile_and_load once a single process
    has accumulated a few hundred live compiled programs (reproducible
    at the same spot in a full-suite run; the same test passes in a
    fresh process). Releasing executables bounds the JIT state and
    keeps the one-process suite stable.
    """
    yield
    jax.clear_caches()
