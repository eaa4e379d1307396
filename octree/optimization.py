"""Shim: forwards to plenoctree_tpu.cli.optimize (reference CLI surface)."""

from absl import app

from plenoctree_tpu.cli.optimize import main

if __name__ == "__main__":
    app.run(main)
