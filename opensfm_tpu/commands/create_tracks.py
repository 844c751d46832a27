"""create_tracks command shim (reference commands/create_tracks.py)."""

from opensfm_tpu.actions import create_tracks
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "create_tracks"
    help = "create tracks"

    def run_impl(self, dataset, args) -> None:
        create_tracks.run_dataset(dataset)
