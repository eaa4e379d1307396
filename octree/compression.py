"""Shim: forwards to plenoctree_tpu.cli.compress (reference CLI surface)."""

import sys

from plenoctree_tpu.cli.compress import main

if __name__ == "__main__":
    sys.exit(main())
