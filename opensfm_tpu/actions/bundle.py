"""Bundle-adjust a reconstruction (reference actions/bundle.py:9-32)."""

from opensfm_tpu import reconstruction as orec


def run_dataset(data, input=None, output=None) -> None:
    reconstructions = data.load_reconstruction(input)
    camera_priors = data.load_camera_models()
    rig_camera_priors = data.load_rig_cameras()
    tracks_manager = data.load_tracks_manager()
    gcp = data.load_ground_control_points()
    for reconstruction in reconstructions:
        # JSON reconstructions carry no observations; re-attach them from the
        # tracks manager so the bundle has projection residuals.
        reconstruction.add_correspondences_from_tracks_manager(tracks_manager)
        orec.bundle(reconstruction, camera_priors, rig_camera_priors, gcp, data.config)
    data.save_reconstruction(reconstructions, output)
