"""`python -m opensfm_tpu <command> <dataset>` — the CLI entry point.

Mirrors reference bin/opensfm_main.py.
"""

from opensfm_tpu.commands import command_runner, opensfm_commands

if __name__ == "__main__":
    command_runner(opensfm_commands)
