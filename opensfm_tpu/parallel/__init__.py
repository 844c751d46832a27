"""Multi-chip parallelism: sharded bundle adjustment over a device mesh.

TPU-native replacement for the reference's cluster story (file-based
submodel split/merge, SURVEY.md §2.4): the map is partitioned by points
across devices, each device reduces its share of the Schur system, and the
reduced camera system is psum-ed over ICI — distributed Gauss-Newton
instead of pose-graph stitching.
"""

from opensfm_tpu.parallel.distributed_ba import (  # noqa: F401
    bundle_adjust_sharded,
    check_cg_compatible,
    make_sharded_cg_lm_step,
    make_sharded_cost,
    make_sharded_lm_step,
    make_sharded_lm_step_dense,
    make_sharded_schur_lm_step,
    shard_problem,
    shard_problem_dense,
)
