"""Test configuration: force a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU backend and pins
JAX_PLATFORMS at import time, so env vars alone are not enough — the
platform must be overridden through jax.config before any backend
initializes. All tests run on CPU (the TPU chip is reserved for benchmarks);
multi-device sharding tests use the 8 virtual host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the attack scans dominate test time on the
# single-core CPU runner; caching makes re-runs fast.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
