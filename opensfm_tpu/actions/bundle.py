"""Bundle-adjust a reconstruction (reference actions/bundle.py)."""

from opensfm_tpu import reconstruction as orec


def run_dataset(data, input=None, output=None) -> None:
    reconstructions = data.load_reconstruction(input)
    camera_priors = data.load_camera_models()
    rig_camera_priors = data.load_rig_cameras()
    gcp = data.load_ground_control_points()
    for reconstruction in reconstructions:
        orec.bundle(reconstruction, camera_priors, rig_camera_priors, gcp, data.config)
    data.save_reconstruction(reconstructions, output)
