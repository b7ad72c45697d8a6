"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This mirrors the reference's implicit CPU-as-oracle strategy (SURVEY.md §4):
all math runs on CPU here and must match TPU behaviour; sharding tests get 8
virtual devices via --xla_force_host_platform_device_count.
MUST run before jax is imported anywhere.
"""

import os

# NOTE: setting JAX_PLATFORMS in os.environ is NOT enough here — the axon
# sitecustomize imports jax at interpreter start and later calls
# jax.config.update("jax_platforms", "axon,cpu"), overriding the env var.
# The config.update below (after import) is the authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: recompiling the pipeline dominates test time
# otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
