"""Regression guard for the round-2 full-suite SIGABRT root cause.

XLA:CPU persistent-cache entries are AOT-compiled for the builder
machine's CPU features; jax's cache key omits them, so a fixed cache path
shared across heterogeneous hosts deserializes executables whose
instructions the current host lacks (XLA: "could lead to execution errors
such as SIGILL", cpu_aot_loader.cc:210).  That crash surfaced hundreds of
tests into the full run, inside `backend.deserialize_executable`.  Every
compilation-cache path this repo configures must therefore embed the
host-CPU fingerprint.
"""

import jax

from opensfm_tpu import host_cpu_fingerprint


def test_fingerprint_is_stable_and_hostlike():
    fp = host_cpu_fingerprint()
    assert isinstance(fp, str) and len(fp) == 12
    assert fp == host_cpu_fingerprint()  # deterministic


def test_active_cache_dir_is_host_scoped():
    cache_dir = jax.config.jax_compilation_cache_dir
    assert cache_dir is not None
    assert host_cpu_fingerprint() in cache_dir, (
        "compilation cache path must embed the host-CPU fingerprint; "
        "a shared fixed path can deserialize executables AOT-compiled for "
        f"another machine's CPU features (got {cache_dir!r})"
    )


def test_package_default_cache_is_host_scoped(tmp_path, monkeypatch):
    """The package-level cache enabling (used by every CLI process) scopes
    by fingerprint too."""
    import opensfm_tpu

    recorded = {}

    class _FakeConfig:
        @staticmethod
        def update(key, value):
            recorded[key] = value

    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.delenv("OPENSFM_TPU_NO_JAX_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setattr(jax, "config", _FakeConfig)
    try:
        opensfm_tpu._enable_persistent_compilation_cache()
    finally:
        monkeypatch.undo()
    assert host_cpu_fingerprint() in recorded.get(
        "jax_compilation_cache_dir", ""
    )


def test_vma_headroom():
    """Canary for the VMA-exhaustion crash: every loaded XLA:CPU executable
    costs ~3.5 never-released memory maps (jax 0.9.0), and the full suite
    loads thousands of programs.  conftest raises vm.max_map_count when
    privileged; if that failed, fail HERE with a clear message instead of
    segfaulting deep inside XLA ~200 tests in."""
    with open("/proc/sys/vm/max_map_count") as f:
        limit = int(f.read())
    with open("/proc/self/maps") as f:
        used = sum(1 for _ in f)
    assert limit - used > 20_000, (
        f"only {limit - used} memory-map slots left (limit {limit}, used "
        f"{used}); raise vm.max_map_count (needs root) or run the suite "
        "in chunks — XLA segfaults when mmap starts failing"
    )
