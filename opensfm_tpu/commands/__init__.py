"""CLI commands (argparse shims over actions).

Mirrors reference `opensfm/commands/__init__.py:33-57`.
"""

from opensfm_tpu.commands.command import CommandBase  # noqa: F401
from opensfm_tpu.commands.command_runner import command_runner  # noqa: F401


def opensfm_commands():
    from opensfm_tpu.commands import (
        align_submodels,
        bundle,
        compute_depthmaps,
        compute_statistics,
        create_rig,
        create_submodels,
        create_tracks,
        detect_features,
        export_bundler,
        export_colmap,
        export_geocoords,
        export_openmvs,
        export_ply,
        export_pmvs,
        export_report,
        export_visualsfm,
        extend_reconstruction,
        extract_metadata,
        match_features,
        mesh,
        reconstruct,
        reconstruct_from_prior,
        run_all,
        undistort,
    )

    return [
        run_all.Command(),
        extract_metadata.Command(),
        detect_features.Command(),
        match_features.Command(),
        create_tracks.Command(),
        reconstruct.Command(),
        bundle.Command(),
        reconstruct_from_prior.Command(),
        extend_reconstruction.Command(),
        mesh.Command(),
        undistort.Command(),
        compute_depthmaps.Command(),
        compute_statistics.Command(),
        export_report.Command(),
        export_ply.Command(),
        export_colmap.Command(),
        export_bundler.Command(),
        export_visualsfm.Command(),
        export_geocoords.Command(),
        export_pmvs.Command(),
        export_openmvs.Command(),
        create_submodels.Command(),
        align_submodels.Command(),
        create_rig.Command(),
    ]
