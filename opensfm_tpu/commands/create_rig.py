"""create_rig command shim."""

from opensfm_tpu.actions import create_rig
from opensfm_tpu.commands.command import CommandBase


class Command(CommandBase):
    name = "create_rig"
    help = "Create rig by pattern matching"

    def add_arguments(self, parser) -> None:
        parser.add_argument("method", choices=["camera", "pattern"],
                            help="definition type")
        parser.add_argument("definition", help="JSON dict rig_camera_id -> regex")

    def run_impl(self, dataset, args) -> None:
        create_rig.run_dataset(dataset, args.method, args.definition)
