"""Reconstruction/Pose/Camera type tests — mirrors reference test_types.py."""

import copy

import numpy as np

from opensfm_tpu import pymap, types
from opensfm_tpu.features import (
    denormalized_image_coordinates,
    normalized_image_coordinates,
)
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose


def test_reconstruction_class_initialization():
    reconstruction = types.Reconstruction()
    camera = Camera.create_perspective(
        0.9722222222222222, 0.006094395128698237, -0.0004952058188617129
    )
    camera.id = "apple iphone 4s back camera 4.28mm f/2.4"
    camera.height = 2448
    camera.width = 3264
    reconstruction.add_camera(camera)

    metadata = pymap.ShotMeasurements()
    metadata.orientation.value = 1
    metadata.capture_time.value = 0.0
    metadata.gps_accuracy.value = 5.0
    metadata.gps_position.value = np.array(
        [1.0815875281451939, -0.96510451436708888, 1.2042133903991235]
    )
    metadata.gravity_down.value = np.array([0.1, 0.9, 0.0])
    metadata.compass_angle.value = 270.0
    metadata.compass_accuracy.value = 15.0
    metadata.sequence_key.value = "a_sequence_key"

    shot0 = reconstruction.create_shot(
        "0", camera.id, Pose([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    )
    shot0.metadata = metadata
    shot1 = reconstruction.create_shot(
        "1", camera.id, Pose([0.0, 0.0, 0.0], [-1.0, 0.0, 0.0])
    )
    shot1.metadata = metadata

    assert len(reconstruction.cameras) == 1
    assert len(reconstruction.shots) == 2
    assert len(reconstruction.points) == 0
    assert reconstruction.cameras[camera.id] is not None
    assert reconstruction.shots[shot0.id] is not None
    assert reconstruction.shots[shot1.id] is not None


def test_is_panorama():
    assert Camera.create_spherical().is_panorama()
    assert not Camera.create_fisheye(0.6, 0, 0).is_panorama()


def test_camera_deepcopy():
    cam1 = Camera.create_perspective(0.5, 0, 0)
    cam2 = copy.deepcopy(cam1)
    assert cam1.focal == cam2.focal
    cam2.focal = 0.7
    assert cam1.focal != cam2.focal
    cam3 = copy.deepcopy(cam2)
    assert cam3.focal == cam2.focal


def test_shot_measurement():
    m = pymap.OptionalValue()
    assert not m.has_value
    m.value = 4
    assert m.has_value
    assert m.value == 4


def _assert_pose_equals_T(pose, T_cw):
    assert np.allclose(pose.get_R_world_to_cam(), T_cw[:3, :3])
    assert np.allclose(pose.translation, T_cw[:3, 3])
    T_wc = np.linalg.inv(T_cw)
    assert np.allclose(pose.get_R_cam_to_world(), T_wc[:3, :3])
    assert np.allclose(pose.get_origin(), T_wc[:3, 3])
    assert np.allclose(pose.get_Rt(), T_cw[:3, :4])


def test_pose_init_and_matrices():
    rng = np.random.default_rng(0)
    rotvec = 0.3 * rng.normal(size=3)
    t = rng.normal(size=3)
    pose = Pose(rotvec, t)
    T = np.eye(4)
    T[:3, :3] = pose.get_rotation_matrix()
    T[:3, 3] = t
    _assert_pose_equals_T(pose, T)


def test_pose_setter():
    rng = np.random.default_rng(1)
    pose = Pose()
    R = Pose(0.4 * rng.normal(size=3)).get_rotation_matrix()
    pose.set_rotation_matrix(R)
    assert np.allclose(pose.get_rotation_matrix(), R)
    origin = rng.normal(size=3)
    pose.set_origin(origin)
    assert np.allclose(pose.get_origin(), origin)
    # set_rotation_matrix preserves the origin-translation relation.
    assert np.allclose(pose.translation, -R @ origin)


def test_pose_transform():
    pose = Pose([0.0, 0.0, np.pi / 2], [1.0, 2.0, 3.0])
    p = np.array([1.0, 0.0, 0.0])
    transformed = pose.transform(p)
    # x_cam = R x + t
    assert np.allclose(
        transformed, pose.get_rotation_matrix() @ p + pose.translation
    )
    back = pose.transform_inverse(transformed)
    assert np.allclose(back, p)


def test_pose_inverse():
    rng = np.random.default_rng(2)
    pose = Pose(0.5 * rng.normal(size=3), rng.normal(size=3))
    inv = pose.inverse()
    composed = pose.compose(inv)
    assert np.allclose(composed.rotation, [0, 0, 0], atol=1e-12)
    assert np.allclose(composed.translation, [0, 0, 0], atol=1e-12)


def test_pixel_to_normalized_conversion():
    width, height = 400, 150
    px_coord = np.array([[50.0, 300.0]])
    norm = normalized_image_coordinates(px_coord, width, height)
    norm_gt = (
        px_coord[0] - np.array([(width - 1.0) / 2.0, (height - 1.0) / 2.0])
    ) / max(width, height)
    assert np.allclose(norm[0], norm_gt)
    back = denormalized_image_coordinates(norm, width, height)
    assert np.allclose(back[0], px_coord[0])
