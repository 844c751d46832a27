"""reconstruct command shim (reference commands/reconstruct.py)."""

from opensfm_tpu.actions import reconstruct
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "reconstruct"
    help = "Compute the reconstruction"

    def add_arguments(self, parser) -> None:
        parser.add_argument(
            "--algorithm",
            choices=["incremental", "triangulation"],
            default="incremental",
            help="reconstruction algorithm",
        )

    def run_impl(self, dataset, args) -> None:
        reconstruct.run_dataset(dataset, args.algorithm)
