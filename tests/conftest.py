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
# Persistent compilation cache makes repeat test runs fast.  The path MUST
# be scoped by the host-CPU fingerprint: XLA:CPU cache entries are
# AOT-compiled for the builder machine's CPU features and jax's cache key
# does not include them, so reusing a fixed path across the fleet's
# heterogeneous hosts deserializes executables with instructions this host
# lacks — the round-2 full-suite SIGABRT/SIGSEGV (crash inside
# backend.deserialize_executable during test_robust, reproduced, gone with
# the cache disabled; XLA warns "could lead to execution errors such as
# SIGILL", cpu_aot_loader.cc:210).  See opensfm_tpu.host_cpu_fingerprint.
from opensfm_tpu import host_cpu_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_test_cache-{host_cpu_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# --- VMA headroom: the round-2 full-suite SIGABRT root cause ---------------
# The suite compiles thousands of DISTINCT XLA:CPU programs; jax 0.9.0 loads
# every one as its own in-memory ELF image costing ~3.5 VMAs that are never
# released (measured: 50 programs -> +180 maps, jax.clear_caches() frees
# ~nothing; the process was at 19,567 maps ~110 tests in).  The kernel's
# default vm.max_map_count=65530 is crossed a bit past 200 tests, after
# which mmap fails and XLA segfaults inside compile
# (backend_compile_and_load) or cache deserialization — reproduced at both
# sites, always ~200 tests in, regardless of the persistent-cache setting.
# Raise the limit when privileged (CI containers run this suite as root);
# otherwise leave it and let the guard test in test_cache_scoping.py warn.


def _raise_map_count_limit(target: int = 1_048_576) -> None:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            current = int(f.read())
        if current < target:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(target))
    except (OSError, ValueError):
        pass  # unprivileged: the limit stays; large suites may need root


_raise_map_count_limit()


# Optional per-test resource diagnostics (SIGABRT hunt): record RSS, VMA
# count and fd count after every test when SIGABRT_DIAG is set, so a
# native crash's resource context survives the process.
if os.environ.get("SIGABRT_DIAG"):
    import pytest

    @pytest.hookimpl(hookwrapper=True)
    def pytest_runtest_teardown(item):
        yield
        try:
            with open("/proc/self/statm") as f:
                rss_pages = int(f.read().split()[1])
            with open("/proc/self/maps") as f:
                n_maps = sum(1 for _ in f)
            n_fds = len(os.listdir("/proc/self/fd"))
            with open(os.environ.get("SIGABRT_DIAG"), "a") as f:
                f.write(
                    f"{item.nodeid}\t{rss_pages * 4 // 1024}\t"
                    f"{n_maps}\t{n_fds}\n"
                )
        except OSError:
            pass
