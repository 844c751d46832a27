"""Test configuration: force CPU JAX with an 8-device virtual mesh + x64.

Mirrors the reference's hermetic test strategy (SURVEY.md §4): tests run on
CPU with double precision; multi-chip sharding is validated on a virtual
8-device host mesh (xla_force_host_platform_device_count), per the driver
contract.  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The env var alone does not override the preinstalled axon TPU platform
# plugin; the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
