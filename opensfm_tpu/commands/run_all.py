"""The canonical 8-stage pipeline as one command.

Equivalent of the reference's `bin/opensfm_run_all` shell script
(extract_metadata -> detect_features -> match_features -> create_tracks ->
reconstruct -> mesh -> undistort -> compute_depthmaps), exposed as a
subcommand so `python -m opensfm_tpu run_all <dataset>` needs no shell
wrapper.
"""

from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "run_all"
    help = "Run the full 8-stage pipeline (metadata through depthmaps)"

    def run_impl(self, data, args) -> None:
        from opensfm_tpu.actions import (
            compute_depthmaps,
            create_tracks,
            detect_features,
            extract_metadata,
            match_features,
            mesh,
            reconstruct,
            undistort,
        )

        extract_metadata.run_dataset(data)
        detect_features.run_dataset(data)
        match_features.run_dataset(data)
        create_tracks.run_dataset(data)
        reconstruct.run_dataset(data)
        mesh.run_dataset(data)
        undistort.run_dataset(data)
        compute_depthmaps.run_dataset(data)
