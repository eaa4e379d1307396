"""Shim: forwards to plenoctree_tpu.cli.eval (reference CLI surface)."""

from absl import app

from plenoctree_tpu.cli.eval import main

if __name__ == "__main__":
    app.run(main)
