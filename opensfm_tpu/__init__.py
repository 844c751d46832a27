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


def _enable_persistent_compilation_cache() -> None:
    """Point JAX at an on-disk compilation cache.

    Every CLI command is a separate process; without a persistent cache each
    stage re-compiles its kernels (20-40 s per program on a tunneled TPU,
    dwarfing the actual compute on small datasets).  Opt out with
    OPENSFM_TPU_NO_JAX_CACHE=1 or override the location with
    JAX_COMPILATION_CACHE_DIR (which JAX reads natively).
    """
    import os

    if os.environ.get("OPENSFM_TPU_NO_JAX_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it
    try:
        import jax

        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "opensfm_tpu", "jax_cache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_enable_persistent_compilation_cache()
