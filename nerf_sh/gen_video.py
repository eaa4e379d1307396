"""Shim: forwards to plenoctree_tpu.cli.gen_video (reference CLI surface)."""

from absl import app

from plenoctree_tpu.cli.gen_video import main

if __name__ == "__main__":
    app.run(main)
