"""CLI commands (argparse shims over actions).

Mirrors reference `opensfm/commands/__init__.py:33-57`.
"""

from opensfm_tpu.commands.command import CommandBase  # noqa: F401
from opensfm_tpu.commands.command_runner import command_runner  # noqa: F401


def opensfm_commands():
    from opensfm_tpu.commands import (
        create_tracks,
        detect_features,
        export_ply,
        extract_metadata,
        match_features,
        reconstruct,
    )

    return [
        extract_metadata.Command(),
        detect_features.Command(),
        match_features.Command(),
        create_tracks.Command(),
        reconstruct.Command(),
        export_ply.Command(),
    ]
