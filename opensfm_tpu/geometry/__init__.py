"""Differentiable geometry core (JAX) + host-side Pose/Similarity shells.

TPU-native replacement for the reference's `pygeometry` C++ module
(reference: opensfm/src/geometry/): camera projections, rotations, poses,
triangulation and minimal solvers as pure, batched, differentiable JAX
functions.
"""

from opensfm_tpu.geometry.pose import Pose, Similarity  # noqa: F401
from opensfm_tpu.geometry.cameras import Camera  # noqa: F401
