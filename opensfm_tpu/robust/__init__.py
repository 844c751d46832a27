"""Batched robust estimation (RANSAC family) on device.

TPU-native replacement for the reference's sequential LO-RANSAC
(`pyrobust`, opensfm/src/robust/): instead of an early-exit loop, K
hypotheses are generated from vmapped minimal solvers, all N x K residuals
are scored on-device in one shot, and local optimization is one batched
non-minimal refit on the winner's inliers.  Fixed shapes, deterministic
seeds.
"""

from opensfm_tpu.robust.ransac import (  # noqa: F401
    RansacResult,
    ransac_absolute_pose,
    ransac_absolute_pose_batched,
    ransac_absolute_pose_known_rotation,
    ransac_essential,
    ransac_fundamental,
    ransac_homography,
    ransac_line,
    ransac_relative_pose,
    ransac_relative_rotation,
    ransac_similarity,
)
