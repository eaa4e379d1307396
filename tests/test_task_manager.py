"""Task manager: spec expansion, templating, results parsing."""

import json
import os

from plenoctree_tpu.cli.task_manager import expand_tasks, parse_results_file


class TestExpandTasks:
    def test_scene_templating(self):
        spec = {
            "data_root": "/data",
            "train_root": "/ckpt",
            "scenes": ["chair", "lego"],
            "scene_tasks": [
                {
                    "train_dir": "{%}",
                    "data_dir": "{%}",
                    "extr_flags": ["--radius", "1.4"],
                }
            ],
        }
        tasks = expand_tasks(spec)
        assert len(tasks) == 2
        assert tasks[0]["train_dir"] == "/ckpt/chair"
        assert tasks[0]["data_dir"] == "/data/chair"
        assert tasks[1]["train_dir"] == "/ckpt/lego"
        assert tasks[0]["extr_flags"] == ["--radius", "1.4"]

    def test_explicit_tasks_appended(self):
        spec = {
            "data_root": "/d",
            "train_root": "/t",
            "scenes": ["a"],
            "scene_tasks": [{"train_dir": "{%}", "data_dir": "{%}"}],
            "tasks": [{"train_dir": "mic", "data_dir": "mic"}],
        }
        tasks = expand_tasks(spec)
        assert len(tasks) == 2
        assert tasks[1]["train_dir"] == "/t/mic"

    def test_repo_config_files_expand(self):
        root = os.path.join(os.path.dirname(__file__), "..", "octree", "config")
        for name in ("syn_sh16.json", "tt_sh25.json", "syn_sg25.json"):
            with open(os.path.join(root, name)) as f:
                spec = json.load(f)
            tasks = expand_tasks(spec)
            assert len(tasks) >= 1
            for t in tasks:
                assert "{%}" not in t["train_dir"]
                assert "extr_flags" in t and "opt_flags" in t


class TestResults:
    def test_parse_results_file(self, tmp_path):
        p = tmp_path / "x.results.json"
        p.write_text(json.dumps({"psnr": 30.5, "ssim": 0.95}))
        assert parse_results_file(str(p)) == {"psnr": 30.5, "ssim": 0.95}
        assert parse_results_file(str(tmp_path / "missing.json")) == {}
