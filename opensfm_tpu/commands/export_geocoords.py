"""export_geocoords command shim (reference commands/export_geocoords.py)."""

from opensfm_tpu.actions import export_geocoords
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_geocoords"
    help = "export geocoords"

    def run_impl(self, dataset, args) -> None:
        export_geocoords.run_dataset(dataset)
