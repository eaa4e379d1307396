"""Config system, LR schedule, marching tetrahedra, timings, metrics writer."""

import json
import os

import numpy as np
import pytest

from plenoctree_tpu.ops.marching import marching_tetrahedra, save_obj
from plenoctree_tpu.utils import config as config_lib
from plenoctree_tpu.utils.io import timings_total_hours, TimingsLog
from plenoctree_tpu.utils.lr import learning_rate_decay
from plenoctree_tpu.utils.metrics_writer import MetricsWriter


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = config_lib.default_config()
        # Spot-check reference defaults (nerf_sh/nerf/utils.py:61-230).
        assert cfg.batch_size == 1024
        assert cfg.lr_init == 5e-4
        assert cfg.lr_final == 5e-6
        assert cfg.num_coarse_samples == 64
        assert cfg.num_fine_samples == 128
        assert cfg.sh_deg == -1
        assert cfg.max_deg_point == 10
        assert cfg.chunk == 8192
        assert cfg.renderer_step_size == 1e-4
        assert cfg.init_grid_depth == 8
        assert cfg.masking_mode == "weight"

    def test_unknown_override_rejected(self):
        with pytest.raises(ValueError):
            config_lib.default_config(bogus_flag=1)

    def test_yaml_update(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("batch_size: 2048\nsh_deg: 4\n")
        cfg = config_lib.default_config(config=str(p)[:-5])
        config_lib.update_flags(cfg)
        assert cfg.batch_size == 2048
        assert cfg.sh_deg == 4

    def test_yaml_unknown_key_raises(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("nonsense_key: 1\n")
        cfg = config_lib.default_config(config=str(p))
        with pytest.raises(ValueError, match="nonsense_key"):
            config_lib.update_flags(cfg)

    def test_reference_config_files_load(self):
        root = os.path.join(os.path.dirname(__file__), "..")
        for name in ["blender", "tt", "misc/og_nerf", "misc/proj", "misc/sg"]:
            cfg = config_lib.default_config(
                config=os.path.join(root, "nerf_sh", "config", name)
            )
            config_lib.update_flags(cfg)
        assert cfg.sg_dim == 25  # last one was sg.yaml

    def test_check_flags(self):
        cfg = config_lib.default_config()
        with pytest.raises(ValueError):
            config_lib.check_flags(cfg)
        cfg.train_dir = "/tmp/x"
        with pytest.raises(ValueError):
            config_lib.check_flags(cfg)
        config_lib.check_flags(cfg, require_data=False)


class TestLR:
    def test_endpoints(self):
        assert np.isclose(learning_rate_decay(0, 5e-4, 5e-6, 100), 5e-4)
        assert np.isclose(learning_rate_decay(100, 5e-4, 5e-6, 100), 5e-6)

    def test_log_linear_midpoint(self):
        mid = learning_rate_decay(50, 1e-2, 1e-4, 100)
        assert np.isclose(float(mid), 1e-3, rtol=1e-4)

    def test_delay_warmup(self):
        early = learning_rate_decay(0, 1e-2, 1e-4, 100, lr_delay_steps=10, lr_delay_mult=0.1)
        after = learning_rate_decay(10, 1e-2, 1e-4, 100, lr_delay_steps=10, lr_delay_mult=0.1)
        assert float(early) == pytest.approx(1e-3, rel=1e-3)
        assert float(after) > float(early)


class TestMarching:
    def test_sphere_surface(self):
        n = 24
        g = np.mgrid[:n, :n, :n].astype(np.float64)
        center = (n - 1) / 2
        dist = np.sqrt(((g - center) ** 2).sum(0))
        vol = 10.0 - dist  # inside > 0
        verts, tris = marching_tetrahedra(vol, iso=0.0)
        assert len(verts) > 100
        assert len(tris) > 100
        # All vertices lie near the radius-10 sphere.
        r = np.linalg.norm(verts - center, axis=-1)
        np.testing.assert_allclose(r, 10.0, atol=0.2)
        # Triangle indices valid.
        assert tris.max() < len(verts)

    def test_empty_volume(self):
        verts, tris = marching_tetrahedra(np.zeros((4, 4, 4)), iso=0.5)
        assert len(verts) == 0 and len(tris) == 0

    def test_save_obj(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
        tris = np.array([[0, 1, 2]])
        p = str(tmp_path / "m.obj")
        save_obj(verts, tris, p)
        lines = open(p).read().strip().split("\n")
        assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"


class TestIO:
    def test_timings_roundtrip(self, tmp_path):
        p = str(tmp_path / "timings.txt")
        log = TimingsLog(p)
        log.write(0)
        log.write(100)
        hours = timings_total_hours(p)
        assert 0 <= hours < 0.01

    def test_metrics_writer_jsonl(self, tmp_path):
        w = MetricsWriter(str(tmp_path))
        w.scalar("loss", 0.5, 10)
        w.scalar("psnr", 30.0, 10)
        w.close()
        lines = [
            json.loads(x)
            for x in open(os.path.join(str(tmp_path), "metrics.jsonl"))
        ]
        assert lines[0]["tag"] == "loss" and lines[0]["value"] == 0.5
        assert lines[1]["step"] == 10
