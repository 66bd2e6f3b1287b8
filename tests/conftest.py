import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms to
# "axon,cpu" regardless of the env var; pin tests to the CPU mesh unless the
# suite is explicitly run against hardware.
if os.environ.get("SOBER_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is compile-dominated on this
# 1-core box (the big fused/sharded programs take minutes each on XLA:CPU);
# caching them on disk makes reruns start from warm executables. Misses
# degrade gracefully, and the on-disk cache is orthogonal to the in-process
# clear_caches() below (reloading from disk still bounds the map count).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# XLA:CPU leaks virtual-memory mappings across compilations (each compiled
# executable holds JIT code pages); a full-suite run in one process crosses
# the kernel's vm.max_map_count (65530 default) at ~75% of the suite and
# segfaults inside backend_compile_and_load. Dropping the jit caches between
# test modules releases the executables and keeps the map count bounded.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
