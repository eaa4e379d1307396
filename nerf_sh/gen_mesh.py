"""Shim: forwards to plenoctree_tpu.cli.gen_mesh (reference CLI surface)."""

from absl import app

from plenoctree_tpu.cli.gen_mesh import main

if __name__ == "__main__":
    app.run(main)
