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
