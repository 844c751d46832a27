"""extend_reconstruction command shim (reference commands/extend_reconstruction.py)."""

from opensfm_tpu.actions import extend_reconstruction
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "extend_reconstruction"
    help = "extend reconstruction"

    def run_impl(self, dataset, args) -> None:
        extend_reconstruction.run_dataset(dataset)
