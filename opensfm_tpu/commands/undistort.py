"""undistort command shim (reference commands/undistort.py)."""

from opensfm_tpu.actions import undistort
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "undistort"
    help = "undistort"

    def run_impl(self, dataset, args) -> None:
        undistort.run_dataset(dataset)
