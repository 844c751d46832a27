"""Rig grouping + calibration tests — mirrors reference test_rig.py."""

import numpy as np

from opensfm_tpu import rig, types
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose


def test_create_instances_with_patterns():
    instance1 = [
        "12345_left.jpg", "12345_bottom.jpg", "12345_top.jpg",
        "12345_right.jpg",
    ]
    instance2 = ["1234567_left.jpg", "1234567_bottom.jpg", "1234567_top.jpg"]
    instance3 = [
        "RED_SENSOR_001-12345678.jpg",
        "GREEN_SENSOR_002-12345678.jpg",
        "BLUE_SENSOR_003-12345678.jpg",
    ]
    instance4 = ["RED_toto.jpg", "tata.jpg"]

    rig_patterns = {
        "camera_left": "(left)",
        "camera_right": "(right)",
        "camera_top": "(top)",
        "camera_bottom": "(bottom)",
        "red": "(RED_SENSOR_001)",
        "green": "(GREEN_SENSOR_002)",
        "blue": "(BLUE_SENSOR_003)",
    }
    instances, single_shots = rig.create_instances_with_patterns(
        instance1 + instance2 + instance3 + instance4, rig_patterns
    )

    assert len(instances) == 3
    assert len(single_shots) == 2
    assert [x[0] for x in instances["12345_.jpg"]] == instance1
    assert [x[0] for x in instances["1234567_.jpg"]] == instance2
    assert [x[0] for x in instances["-12345678.jpg"]] == instance3


def test_compute_relative_pose():
    rec = types.Reconstruction()
    for i in range(1, 5):
        cam = Camera.create_spherical()
        cam.id = f"camera{i}"
        rec.add_camera(cam)

    # First rig instance: 4 cameras around (-2,-3,0)-ish, identity rotation.
    rec.create_shot("shot1", "camera1", Pose([0, 0, 0], [-2, -2, 0]))
    rec.create_shot("shot2", "camera2", Pose([0, 0, 0], [-3, -3, 0]))
    rec.create_shot("shot3", "camera3", Pose([0, 0, 0], [-1, -3, 0]))
    rec.create_shot("shot4", "camera4", Pose([0, 0, 0], [-2, -4, 0]))

    # Second instance: same rig rotated by pi/2 around Z.
    for sid, cam_id, origin in [
        ("shot5", "camera1", [-6, 0, 0]),
        ("shot6", "camera2", [-7, 1, 0]),
        ("shot7", "camera3", [-7, -1, 0]),
        ("shot8", "camera4", [-8, 0, 0]),
    ]:
        pose = Pose([0, 0, -1.5707963])
        pose.set_origin(np.array(origin, dtype=float))
        rec.create_shot(sid, cam_id, pose)

    pose_instances = [
        [
            (rec.shots["shot1"], "camera_id_1"),
            (rec.shots["shot2"], "camera_id_2"),
            (rec.shots["shot3"], "camera_id_3"),
            (rec.shots["shot4"], "camera_id_4"),
        ],
        [
            (rec.shots["shot5"], "camera_id_1"),
            (rec.shots["shot6"], "camera_id_2"),
            (rec.shots["shot7"], "camera_id_3"),
            (rec.shots["shot8"], "camera_id_4"),
        ],
    ]

    rig_cameras = rig.compute_relative_pose(pose_instances)

    assert np.allclose(
        [0, -1, 0], rig_cameras["camera_id_1"].pose.get_origin(), atol=1e-7
    )
    assert np.allclose(
        [1, 0, 0], rig_cameras["camera_id_2"].pose.get_origin(), atol=1e-7
    )
    assert np.allclose(
        [-1, 0, 0], rig_cameras["camera_id_3"].pose.get_origin(), atol=1e-7
    )
    assert np.allclose(
        [0, 1, 0], rig_cameras["camera_id_4"].pose.get_origin(), atol=1e-7
    )


def test_rig_assignments_per_image():
    assignments = [
        [("im1_a", "left"), ("im1_b", "right")],
        [("im2_a", "left"), ("im2_b", "right")],
    ]
    per_image = rig.rig_assignments_per_image(assignments)
    assert per_image["im1_a"] == ("0", "left", ["im1_a", "im1_b"])
    assert per_image["im2_b"] == ("1", "right", ["im2_a", "im2_b"])


def test_group_instances():
    instances = {
        "a": [("im1", "left"), ("im2", "right")],
        "b": [("im3", "left"), ("im4", "right")],
        "c": [("im5", "top")],
    }
    groups = rig.group_instances(instances)
    assert len(groups) == 2
    assert len(groups["left, right"]) == 2
    assert len(groups["top"]) == 1
