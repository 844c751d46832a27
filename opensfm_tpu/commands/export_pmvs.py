"""export_pmvs command shim."""

from opensfm_tpu.actions import export_pmvs
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_pmvs"
    help = "export pmvs"

    def run_impl(self, dataset, args) -> None:
        export_pmvs.run_dataset(dataset)
