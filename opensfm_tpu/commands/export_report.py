"""export_report command shim (reference commands/export_report.py)."""

from opensfm_tpu.actions import export_report
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "export_report"
    help = "export report"

    def run_impl(self, dataset, args) -> None:
        export_report.run_dataset(dataset)
