"""Bundle adjustment: IRLS Levenberg-Marquardt with explicit Schur complement.

TPU-native replacement for the reference's Ceres backend
(bundle/bundle_adjuster.h:178-374, src/bundle_adjuster.cc:595-1121,
sfm/src/ba_helpers.cc): residuals and Jacobians are vmapped JAX functions,
the camera-point structure is eliminated with a batched Schur complement,
robust losses become IRLS weights, and priors (GPS on rig instances,
camera intrinsics, GCP points, rig camera poses) are extra residual rows.
"""

from opensfm_tpu.ba.lm import BAProblem, BAResult, bundle_adjust  # noqa: F401
