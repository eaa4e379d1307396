"""Shim: forwards to plenoctree_tpu.cli.extract (reference CLI surface)."""

from absl import app

from plenoctree_tpu.cli.extract import main

if __name__ == "__main__":
    app.run(main)
