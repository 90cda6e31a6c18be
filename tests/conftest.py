"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: the
reference has no multi-device tests; we simulate an 8-chip mesh on CPU).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# f32 by default; individual tests opt into x64 where needed.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import; force the CPU
# backend at runtime so tests run locally (tunneled-TPU dispatch is slow).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is compile-dominated on
# this 1-core host (measured 3.8x on the tiny-pipeline compile); warm
# re-runs of both lanes drop by tens of minutes.  The cpu_aot_loader
# "machine feature mismatch" stderr spam it produces is a pseudo-feature
# naming artifact (same physical host) — pytest captures it away.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass  # older JAX: executable-level cache still applies
