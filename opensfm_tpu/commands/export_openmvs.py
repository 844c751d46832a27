"""export_openmvs command shim."""

from opensfm_tpu.actions import export_openmvs
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_openmvs"
    help = "export openmvs"

    def run_impl(self, dataset, args) -> None:
        export_openmvs.run_dataset(dataset)
