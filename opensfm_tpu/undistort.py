"""Undistortion: rectify shots to ideal perspective, panoramas to cube faces.

Mirrors reference `opensfm/undistort.py:25-453`
(undistort_reconstruction:25, perspective_camera_from_*:253-307,
perspective_views_of_a_panorama:310-357,
render_perspective_view_of_a_panorama:360-403, add_subshot_tracks:406).
The pixel remap itself is a batched bearing->project map computed in one
vectorized pass (ComputeCameraMapping equivalent, geometry/camera.h:120).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional

import numpy as np

from opensfm_tpu import pymap, types
from opensfm_tpu.features import denormalized_image_coordinates, normalized_image_coordinates
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose

logger = logging.getLogger(__name__)


def perspective_camera_from_perspective(camera: Camera) -> Camera:
    """Undistorted version of a perspective camera (undistort.py:253)."""
    new_camera = Camera.create_perspective(camera.focal, 0.0, 0.0)
    new_camera.id = camera.id
    new_camera.width = camera.width
    new_camera.height = camera.height
    return new_camera


def perspective_camera_from_brown(brown: Camera) -> Camera:
    """Ideal perspective camera from a Brown camera (undistort.py:264)."""
    new_camera = Camera.create_perspective(
        brown.focal * (1 + brown.aspect_ratio) / 2.0, 0.0, 0.0
    )
    new_camera.id = brown.id
    new_camera.width = brown.width
    new_camera.height = brown.height
    return new_camera


def perspective_camera_from_fisheye(fisheye: Camera) -> Camera:
    """Ideal perspective camera from a fisheye (undistort.py:277)."""
    new_camera = Camera.create_perspective(fisheye.focal, 0.0, 0.0)
    new_camera.id = fisheye.id
    new_camera.width = fisheye.width
    new_camera.height = fisheye.height
    return new_camera


def perspective_camera_from_fisheye_opencv(fisheye_opencv: Camera) -> Camera:
    new_camera = Camera.create_perspective(
        fisheye_opencv.focal * (1 + fisheye_opencv.aspect_ratio) / 2.0, 0.0, 0.0
    )
    new_camera.id = fisheye_opencv.id
    new_camera.width = fisheye_opencv.width
    new_camera.height = fisheye_opencv.height
    return new_camera


def perspective_camera_from_fisheye62(fisheye62: Camera) -> Camera:
    new_camera = Camera.create_perspective(
        fisheye62.focal * (1 + fisheye62.aspect_ratio) / 2.0, 0.0, 0.0
    )
    new_camera.id = fisheye62.id
    new_camera.width = fisheye62.width
    new_camera.height = fisheye62.height
    return new_camera


_PERSPECTIVE_FROM = {
    "perspective": perspective_camera_from_perspective,
    "brown": perspective_camera_from_brown,
    "fisheye": perspective_camera_from_fisheye,
    "fisheye_opencv": perspective_camera_from_fisheye_opencv,
    "fisheye62": perspective_camera_from_fisheye62,
    "radial": perspective_camera_from_brown,
    "simple_radial": perspective_camera_from_brown,
}


def undistort_reconstruction(
    tracks_manager: Optional[pymap.TracksManager],
    reconstruction: types.Reconstruction,
    data,
    udata,
) -> Dict[pymap.Shot, List[pymap.Shot]]:
    """Undistorted reconstruction + shot mapping (undistort.py:25-87)."""
    all_images = set(data.images()) if data else set(reconstruction.shots)
    urec = types.Reconstruction()
    urec.points = reconstruction.points
    urec.reference = reconstruction.reference
    rig_instance_count = iter(range(1_000_000))
    utracks_manager = pymap.TracksManager()

    logger.debug("Undistorting the reconstruction")
    undistorted_shots = {}
    for shot in reconstruction.shots.values():
        if shot.id not in all_images:
            continue
        pt = shot.camera.projection_type
        if pt in _PERSPECTIVE_FROM:
            ucamera = _PERSPECTIVE_FROM[pt](shot.camera)
            urec.add_camera(ucamera)
            subshots = [get_shot_with_different_camera(urec, shot, ucamera,
                                                       rig_instance_count)]
        elif pt in ("equirectangular", "spherical"):
            subshot_width = int(data.config["depthmap_resolution"]) if data else 640
            subshots = perspective_views_of_a_panorama(
                shot, subshot_width, urec, f"perspective_panorama_{shot.camera.id}",
                rig_instance_count,
            )
        else:
            logger.warning("Not undistorting unsupported camera type %s", pt)
            continue

        for subshot in subshots:
            if tracks_manager:
                add_subshot_tracks(tracks_manager, utracks_manager, shot, subshot)
        undistorted_shots[shot.id] = subshots

    udata.save_undistorted_reconstruction([urec])
    if tracks_manager:
        udata.save_undistorted_tracks_manager(utracks_manager)
    udata.save_undistorted_shot_ids(
        {shot_id: [s.id for s in subshots]
         for shot_id, subshots in undistorted_shots.items()}
    )
    return undistorted_shots


def get_shot_with_different_camera(
    urec: types.Reconstruction, shot: pymap.Shot, camera: Camera,
    rig_instance_count,
) -> pymap.Shot:
    """Same pose, new (undistorted) camera (undistort.py:***)."""
    new_shot = urec.create_shot(shot.id, camera.id, shot.pose)
    new_shot.metadata.set(shot.metadata)
    return new_shot


def perspective_views_of_a_panorama(
    spherical_shot: pymap.Shot, width: int, urec: types.Reconstruction,
    camera_id: str, rig_instance_count,
) -> List[pymap.Shot]:
    """Render a panorama as 6 cube faces grouped in a rig
    (undistort.py:310-357)."""
    camera = Camera.create_perspective(0.5, 0.0, 0.0)
    camera.id = camera_id
    camera.width = width
    camera.height = width
    urec.add_camera(camera)

    names = ["front", "left", "back", "right", "top", "bottom"]
    rotations = [
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[0, 0, -1], [0, 1, 0], [1, 0, 0]],
        [[-1, 0, 0], [0, 1, 0], [0, 0, -1]],
        [[0, 0, 1], [0, 1, 0], [-1, 0, 0]],
        [[1, 0, 0], [0, 0, -1], [0, 1, 0]],
        [[1, 0, 0], [0, 0, 1], [0, -1, 0]],
    ]

    instance_id = f"panorama_rig_{next(rig_instance_count)}"
    urec.add_rig_instance(pymap.RigInstance(instance_id))
    shots = []
    for name, rotation in zip(names, rotations):
        rig_camera_id = f"{camera_id}_rig_{name}"
        if rig_camera_id not in urec.rig_cameras:
            rig_pose = Pose()
            rig_pose.set_rotation_matrix(np.array(rotation, dtype=np.float64))
            urec.add_rig_camera(pymap.RigCamera(rig_pose, rig_camera_id))
        shot_id = f"{spherical_shot.id}_perspective_view_{name}"
        shot = urec.create_shot(
            shot_id, camera.id,
            rig_camera_id=rig_camera_id, rig_instance_id=instance_id,
        )
        shot.metadata.set(spherical_shot.metadata)
        shots.append(shot)
    urec.rig_instances[instance_id].pose = spherical_shot.pose
    return shots


def compute_camera_mapping(
    from_camera: Camera, to_camera: Camera, width: int, height: int,
    rotation: Optional[np.ndarray] = None,
):
    """Pixel maps (map_x, map_y) resampling `from_camera` into `to_camera`
    — the ComputeCameraMapping equivalent (geometry/camera.h:120),
    vectorized over all destination pixels."""
    ys, xs = np.mgrid[0:height, 0:width]
    px = np.column_stack([xs.ravel(), ys.ravel()]).astype(np.float64)
    norm = normalized_image_coordinates(px, width, height)
    bearings = to_camera.bearings_many(norm)
    if rotation is not None:
        bearings = bearings @ rotation.T
    uv = from_camera.project_many(bearings)
    src_px = denormalized_image_coordinates(
        uv, from_camera.width, from_camera.height
    )
    map_x = src_px[:, 0].reshape(height, width).astype(np.float32)
    map_y = src_px[:, 1].reshape(height, width).astype(np.float32)
    return map_x, map_y


def undistort_image(
    image: np.ndarray, from_camera: Camera, to_camera: Camera,
    max_size: int = 100000, rotation: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Remap an image between camera models."""
    import cv2

    width = min(to_camera.width, max_size)
    height = min(to_camera.height, max_size)
    map_x, map_y = compute_camera_mapping(
        from_camera, to_camera, width, height, rotation
    )
    return cv2.remap(image, map_x, map_y, cv2.INTER_LINEAR)


def render_perspective_view_of_a_panorama(
    image: np.ndarray, panoshot: pymap.Shot, perspectiveshot: pymap.Shot,
    interpolation=None, borderMode=None,
) -> np.ndarray:
    """Render a cube face from a panorama (undistort.py:360-403)."""
    import cv2

    # Relative rotation panorama -> perspective face.
    rotation = (
        perspectiveshot.pose.get_rotation_matrix()
        @ panoshot.pose.get_rotation_matrix().T
    )
    return undistort_image(
        image, panoshot.camera, perspectiveshot.camera,
        rotation=rotation.T,
    )


def undistort_reconstruction_with_images(
    tracks_manager, reconstruction, data, udata, skip_images: bool = False
) -> Dict:
    """Undistort reconstruction + write undistorted images
    (undistort.py:90-127)."""
    undistorted_shots = undistort_reconstruction(
        tracks_manager, reconstruction, data, udata
    )
    if skip_images:
        return undistorted_shots
    for shot_id, subshots in undistorted_shots.items():
        shot = reconstruction.shots[shot_id]
        image = data.load_image(shot_id)
        max_size = data.config["undistorted_image_max_size"]
        for subshot in subshots:
            if shot.camera.projection_type in ("equirectangular", "spherical"):
                undistorted = render_perspective_view_of_a_panorama(
                    image, shot, subshot
                )
            else:
                undistorted = undistort_image(
                    image, shot.camera, subshot.camera, max_size
                )
            udata.save_undistorted_image(subshot.id, undistorted)
        logger.info("Undistorted %s", shot_id)
    return undistorted_shots


def add_subshot_tracks(
    tracks_manager: pymap.TracksManager,
    utracks_manager: pymap.TracksManager,
    shot: pymap.Shot,
    subshot: pymap.Shot,
) -> None:
    """Remap tracks into the undistorted shots (undistort.py:406-450)."""
    if shot.id not in set(tracks_manager.get_shot_ids()):
        return
    if shot.camera.projection_type in ("equirectangular", "spherical"):
        add_pano_subshot_tracks(tracks_manager, utracks_manager, shot, subshot)
        return
    for track_id, obs in tracks_manager.get_shot_observations(shot.id).items():
        bearing = shot.camera.bearing(obs.point)
        new_obs = obs.copy()
        new_obs.point = subshot.camera.project(bearing)
        utracks_manager.add_observation(subshot.id, track_id, new_obs)


def add_pano_subshot_tracks(
    tracks_manager, utracks_manager, panoshot, perspectiveshot
) -> None:
    """Project panorama tracks into a cube face, keeping in-frustum obs."""
    rotation = (
        perspectiveshot.pose.get_rotation_matrix()
        @ panoshot.pose.get_rotation_matrix().T
    )
    for track_id, obs in tracks_manager.get_shot_observations(panoshot.id).items():
        bearing = panoshot.camera.bearing(obs.point)
        rotated = rotation @ bearing
        if rotated[2] <= 0:
            continue
        perspective_feature = perspectiveshot.camera.project(rotated)
        if (
            perspective_feature[0] < -0.5 or perspective_feature[0] > 0.5
            or perspective_feature[1] < -0.5 or perspective_feature[1] > 0.5
        ):
            continue
        new_obs = obs.copy()
        new_obs.point = perspective_feature
        utracks_manager.add_observation(perspectiveshot.id, track_id, new_obs)
