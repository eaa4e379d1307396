"""Shim: forwards to plenoctree_tpu.cli.task_manager (reference CLI surface)."""

import sys

from plenoctree_tpu.cli.task_manager import main

if __name__ == "__main__":
    sys.exit(main())
