"""align_submodels command shim."""

from opensfm_tpu.actions import align_submodels
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "align_submodels"
    help = "align submodels"

    def run_impl(self, dataset, args) -> None:
        align_submodels.run_dataset(dataset)
