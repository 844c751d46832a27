"""Large-scale submodel pipeline: split, per-submodel SfM, global alignment.

Mirrors reference `opensfm/large/` (metadataset.py, tools.py).  On TPU pods
the preferred path is the sharded distributed BA
(opensfm_tpu.parallel.distributed_ba); this file-based split/merge is kept
for interop and host-parallel workflows.
"""
