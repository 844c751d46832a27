"""create_submodels command shim."""

from opensfm_tpu.actions import create_submodels
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "create_submodels"
    help = "create submodels"

    def run_impl(self, dataset, args) -> None:
        create_submodels.run_dataset(dataset)
