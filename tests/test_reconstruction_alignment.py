"""Submodel pose-graph alignment tests.

Mirrors reference opensfm/test/test_reconstruction_alignment.py: shots with
GPS + relative-motion constraints recover submodel similarities.
"""

import numpy as np

from opensfm_tpu.ba.alignment import (
    RARelativeMotionConstraint,
    ReconstructionAlignment,
)
from opensfm_tpu.geometry.pose import Pose


def get_shot_origin(shot):
    pose = Pose([shot.rx, shot.ry, shot.rz], [shot.tx, shot.ty, shot.tz])
    return pose.get_origin()


def get_reconstruction_origin(r):
    s = r.scale
    pose = Pose([r.rx, r.ry, r.rz], [r.tx, r.ty, r.tz])
    return pose.get_origin() / s


def test_single_shot():
    """Single shot pulled to its GPS position."""
    ra = ReconstructionAlignment()
    ra.add_shot("1", 0.5, 0, 0, 0, 0, 0, False)
    ra.add_absolute_position_constraint("1", 1, 0, 0, 1)
    ra.run()
    s1 = ra.get_shot("1")
    assert np.allclose(get_shot_origin(s1), [1, 0, 0], atol=1e-6)


def test_singleton_reconstruction():
    """Reconstruction with a single shot aligned via relative motion."""
    ra = ReconstructionAlignment()
    ra.add_shot("1", 0, 0, 0, 0, 0, 0, False)
    ra.add_reconstruction("a", 0, 0, 0, 0, 0, 0, 1, False)
    ra.add_relative_motion_constraint(
        RARelativeMotionConstraint("a", "1", 0, 0, 0, 0, 0, 0)
    )
    ra.add_absolute_position_constraint("1", 1, 0, 0, 1)
    ra.run()
    s1 = ra.get_shot("1")
    assert np.allclose(get_shot_origin(s1), [1, 0, 0], atol=1e-6)


def test_two_shots_one_reconstruction():
    """Two shots in one reconstruction dragged to their GPS positions."""
    ra = ReconstructionAlignment()
    ra.add_shot("1", 0, 0, 0, 0, 0, 0, False)
    ra.add_shot("2", 0, 0, 0, -1, 0, 0, False)
    ra.add_reconstruction("a", 0, 0, 0, 0, 0, 0, 1, False)
    ra.add_relative_motion_constraint(
        RARelativeMotionConstraint("a", "1", 0, 0, 0, 0, 0, 0)
    )
    ra.add_relative_motion_constraint(
        RARelativeMotionConstraint("a", "2", 0, 0, 0, -1, 0, 0)
    )
    ra.add_absolute_position_constraint("1", 1, 0, 0, 1)
    ra.add_absolute_position_constraint("2", 3, 0, 0, 1)
    ra.run()
    s1 = ra.get_shot("1")
    s2 = ra.get_shot("2")
    rec_a = ra.get_reconstruction("a")
    assert np.allclose(get_shot_origin(s1), [1, 0, 0], atol=1e-2)
    assert np.allclose(get_shot_origin(s2), [3, 0, 0], atol=1e-2)
    assert np.allclose(get_reconstruction_origin(rec_a), [1, 0, 0], atol=1e-2)
    assert np.isclose(rec_a.scale, 0.5, atol=1e-2)


def test_two_reconstructions_common_point():
    """Two translated reconstructions tied by common points."""
    ra = ReconstructionAlignment()
    ra.add_reconstruction("a", 0, 0, 0, 0, 0, 0, 1, False)
    ra.add_reconstruction("b", 0, 0, 0, 0, 0, 0, 1, False)
    # Rec a is anchored by two GPS shots.
    ra.add_shot("a1", 0, 0, 0, 0, 0, 0, False)
    ra.add_shot("a2", 0, 0, 0, -2, 0, 0, False)
    ra.add_relative_motion_constraint(
        RARelativeMotionConstraint("a", "a1", 0, 0, 0, 0, 0, 0)
    )
    ra.add_relative_motion_constraint(
        RARelativeMotionConstraint("a", "a2", 0, 0, 0, -2, 0, 0)
    )
    ra.add_absolute_position_constraint("a1", 0, 0, 0, 0.1)
    ra.add_absolute_position_constraint("a2", 2, 0, 0, 0.1)
    # Common points between frames of a and b: b is shifted by (0, 1, 0).
    for p in ([0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]):
        pb = [p[0], p[1] - 1.0, p[2]]
        ra.add_common_point_constraint(
            "a", p[0], p[1], p[2], "b", pb[0], pb[1], pb[2], 0.01
        )
    ra.run()
    rb = ra.get_reconstruction("b")
    # transform_point(b, pb) must equal transform_point(a, p) = p (a ~ id).
    pose_b = Pose([rb.rx, rb.ry, rb.rz], [rb.tx, rb.ty, rb.tz])
    pb = np.array([0.0, -1.0, 0.0])
    pa = pose_b.get_rotation_matrix().T @ ((pb - pose_b.translation) / rb.scale)
    assert np.allclose(pa, [0, 0, 0], atol=1e-2)
