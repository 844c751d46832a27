"""compute_depthmaps command shim."""

from opensfm_tpu.actions import compute_depthmaps
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "compute_depthmaps"
    help = "Compute depthmaps"

    def run_impl(self, dataset, args) -> None:
        compute_depthmaps.run_dataset(dataset)
