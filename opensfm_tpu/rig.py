"""Rig handling: pattern-based rig instance grouping + calibration.

Mirrors reference `opensfm/rig.py` (rig_assignments_per_image:39,
create_instances_with_patterns:70, compute_relative_pose:210,
create_rig_cameras_from_reconstruction:264, create_rigs_with_pattern:298).
Calibration-by-SfM-on-subsets arrives with the pipeline actions.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, List, Optional, Set, Tuple, TypeVar

import numpy as np

from opensfm_tpu import pymap, types
from opensfm_tpu.geometry.pose import Pose

logger = logging.getLogger(__name__)

TRigPatterns = Dict[str, str]
TRigCameraGroup = Set[str]
TRigImage = Tuple[str, str]
TRigInstance = List[TRigImage]


def find_image_rig(image: str, rig_patterns: TRigPatterns):
    """(rig camera id, instance member id) for an image given patterns
    (rig.py:47-67)."""
    for rig_camera_id, pattern in rig_patterns.items():
        instance_member_id = re.sub(pattern, "", image)
        if instance_member_id == image:
            continue
        if instance_member_id != "":
            return rig_camera_id, instance_member_id
    return None, None


def create_instances_with_patterns(
    images: List[str], rig_patterns: TRigPatterns
) -> Tuple[Dict[str, TRigInstance], List[str]]:
    """Group images into rig instances by filename patterns (rig.py:70-102)."""
    per_instance: Dict[str, TRigInstance] = {}
    single_shots: List[str] = []
    for image in images:
        rig_camera_id, instance_member_id = find_image_rig(image, rig_patterns)
        if not rig_camera_id:
            single_shots.append(image)
            continue
        per_instance.setdefault(instance_member_id, []).append(
            (image, rig_camera_id)
        )

    instances_per_rig: Dict[str, TRigInstance] = {}
    for member_id, instance in per_instance.items():
        if len(instance) > 1:
            instances_per_rig[member_id] = instance
        else:
            single_shots += [image for image, _ in instance]
    return instances_per_rig, single_shots


def rig_assignments_per_image(
    rig_assignments: List[List[Tuple[str, str]]],
) -> Dict[str, Tuple[str, str, List[str]]]:
    """image -> (instance id, rig camera id, all images of the instance)
    (rig.py:39-45)."""
    assignments_per_image = {}
    for instance_id, instance in enumerate(rig_assignments):
        instance_shots = [s[0] for s in instance]
        for shot_id, rig_camera_id in instance:
            assignments_per_image[shot_id] = (
                str(instance_id), rig_camera_id, instance_shots,
            )
    return assignments_per_image


def compute_relative_pose(
    pose_instances: List[List[Tuple[pymap.Shot, str]]],
) -> Dict[str, pymap.RigCamera]:
    """Average rig camera poses over instances (rig.py:210-261)."""
    # Affine-average instance frames, then shot poses relative to them.
    centers_shots: Dict[str, List[np.ndarray]] = {}
    rotation_shots: Dict[str, List[np.ndarray]] = {}
    for instance in pose_instances:
        origin_center = np.zeros(3)
        for shot, _ in instance:
            origin_center += shot.pose.get_origin()
        origin_center /= len(instance)

        rotation_center = None
        for shot, _ in instance:
            if rotation_center is None:
                rotation_center = shot.pose.get_rotation_matrix()
        assert rotation_center is not None

        for shot, rig_camera_id in instance:
            R_instance = rotation_center
            t_instance = -R_instance @ origin_center
            R_shot = shot.pose.get_rotation_matrix()
            t_shot = shot.pose.translation
            # pose(rig camera) = pose(shot) ∘ pose(instance)^-1
            R_rc = R_shot @ R_instance.T
            t_rc = t_shot - R_rc @ t_instance
            rotation_shots.setdefault(rig_camera_id, []).append(R_rc)
            centers_shots.setdefault(rig_camera_id, []).append(t_rc)

    rig_cameras: Dict[str, pymap.RigCamera] = {}
    for rig_camera_id in centers_shots:
        Rs = np.array(rotation_shots[rig_camera_id])
        # Chordal-average rotation via SVD of the mean matrix.
        M = Rs.mean(axis=0)
        U, _, Vt = np.linalg.svd(M)
        R = U @ np.diag([1.0, 1.0, np.linalg.det(U @ Vt)]) @ Vt
        t = np.array(centers_shots[rig_camera_id]).mean(axis=0)
        pose = Pose()
        pose.set_rotation_matrix(R)
        pose.translation = t
        rig_cameras[rig_camera_id] = pymap.RigCamera(pose, rig_camera_id)
    return rig_cameras


def create_rig_cameras_from_reconstruction(
    reconstruction: types.Reconstruction, instances: List[TRigInstance]
) -> Dict[str, pymap.RigCamera]:
    """Rig cameras from shot poses of a reconstruction (rig.py:264-295)."""
    pose_instances = []
    for instance in instances:
        shots = []
        for image, rig_camera_id in instance:
            if image not in reconstruction.shots:
                break
            shots.append((reconstruction.shots[image], rig_camera_id))
        else:
            if shots:
                pose_instances.append(shots)
    return compute_relative_pose(pose_instances)
