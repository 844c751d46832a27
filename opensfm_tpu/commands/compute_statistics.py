"""compute_statistics command shim (reference commands/compute_statistics.py)."""

from opensfm_tpu.actions import compute_statistics
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "compute_statistics"
    help = "compute statistics"

    def run_impl(self, dataset, args) -> None:
        compute_statistics.run_dataset(dataset)
