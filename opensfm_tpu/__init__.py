"""opensfm_tpu — a TPU-native Structure-from-Motion framework.

A brand-new JAX/XLA/Pallas implementation of the full capability surface of
mapillary/OpenSfM (see /root/repo/SURVEY.md): EXIF-driven camera modelling,
feature detection + descriptor matching, robust two-view geometry, incremental
reconstruction, Schur-complement bundle adjustment, geo-registration,
undistortion, dense depthmaps, statistics and exports — designed TPU-first:

- all per-pair / per-track / per-hypothesis math is batched (`vmap`) and
  compiled (`jit`) with static shapes;
- RANSAC is a fixed-iteration batched hypothesis sweep instead of a
  sequential early-exit loop;
- bundle adjustment is an IRLS Gauss-Newton/LM solver with an explicit
  Schur complement over the camera-point structure, shardable across a
  `jax.sharding.Mesh` via `psum`/`all_gather` collectives;
- host-side Python keeps only the inherently dynamic orchestration
  (growth loop, union-find tracks, IO).
"""

__version__ = "0.1.0"


def host_cpu_fingerprint() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU caches AOT-compiled executables whose instruction selection is
    specific to the BUILDER machine's CPU features, and jax's persistent
    compilation-cache key does not include them (jax 0.9.0).  When the
    same cache directory is reused on a host with a different feature set
    (this fleet schedules one disk image across heterogeneous machines),
    `backend.deserialize_executable` loads code containing instructions
    the host lacks — XLA logs "could lead to execution errors such as
    SIGILL" (cpu_aot_loader.cc:210) and the process can die with
    SIGILL/SIGSEGV/SIGABRT far from any Python cause.  This was the
    round-2 full-test-suite abort.  Scoping every cache path by this
    fingerprint makes a cross-machine cache read structurally impossible.
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def _enable_persistent_compilation_cache() -> None:
    """Point JAX at an on-disk compilation cache, scoped per host CPU.

    Every CLI command is a separate process; without a persistent cache each
    stage re-compiles its kernels (20-40 s per program on a tunneled TPU,
    dwarfing the actual compute on small datasets).  The path embeds
    `host_cpu_fingerprint()` (see its docstring: cross-machine XLA:CPU AOT
    cache entries can SIGILL).  Opt out with OPENSFM_TPU_NO_JAX_CACHE=1 or
    override the location with JAX_COMPILATION_CACHE_DIR (which JAX reads
    natively).
    """
    import os

    if os.environ.get("OPENSFM_TPU_NO_JAX_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it
    try:
        import jax

        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "opensfm_tpu",
            f"jax_cache-{host_cpu_fingerprint()}",
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_enable_persistent_compilation_cache()
