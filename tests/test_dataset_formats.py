"""NSVF and LLFF loader smoke tests against synthetic on-disk fixtures."""

import numpy as np
import pytest

from plenoctree_tpu.data import get_dataset
from plenoctree_tpu.data.synthetic import write_llff_dataset, write_nsvf_dataset
from plenoctree_tpu.utils.config import default_config


class TestNSVF:
    @pytest.fixture(scope="class")
    def nsvf_dir(self, tmp_path_factory):
        return write_nsvf_dataset(str(tmp_path_factory.mktemp("nsvf")))

    def test_train_split(self, nsvf_dir):
        cfg = default_config(dataset="nsvf", data_dir=nsvf_dir, batch_size=16, factor=0)
        ds = get_dataset("train", cfg, prefetch=False)
        assert ds.size == 8
        assert ds.h == ds.w == 48
        batch = next(ds)
        assert batch["pixels"].shape == (16, 3)
        np.testing.assert_allclose(
            np.linalg.norm(batch["rays"].viewdirs, axis=-1), 1.0, atol=1e-5
        )

    def test_test_split_falls_back_to_val_prefix(self, nsvf_dir):
        cfg = default_config(dataset="nsvf", data_dir=nsvf_dir, batch_size=16, factor=0)
        ds = get_dataset("test", cfg, prefetch=False)
        assert ds.size == 3  # no 2_ files -> 1_ fallback

    def test_bbox_exposed(self, nsvf_dir):
        cfg = default_config(dataset="nsvf", data_dir=nsvf_dir, batch_size=16, factor=0)
        ds = get_dataset("train", cfg, prefetch=False)
        assert ds.bbox is not None
        np.testing.assert_allclose(ds.bbox[:6], [-1, -1, -1, 1, 1, 1])

    def test_poses_match_synthetic_orbit(self, nsvf_dir):
        # The loader's cam_trans round-trip must reproduce the orbit c2ws.
        from plenoctree_tpu.data.synthetic import render_synthetic_scene

        cfg = default_config(dataset="nsvf", data_dir=nsvf_dir, batch_size=4, factor=0)
        ds = get_dataset("train", cfg, prefetch=False)
        _, c2ws, _ = render_synthetic_scene("train", 8, 48, True, 2.0, 6.0)
        np.testing.assert_allclose(ds.camtoworlds, c2ws, atol=1e-5)


class TestLLFF:
    @pytest.fixture(scope="class")
    def llff_dir(self, tmp_path_factory):
        return write_llff_dataset(str(tmp_path_factory.mktemp("llff")))

    def test_splits_by_llffhold(self, llff_dir):
        cfg = default_config(dataset="llff", data_dir=llff_dir, batch_size=8, factor=0, llffhold=5)
        train = get_dataset("train", cfg, prefetch=False)
        test = get_dataset("test", cfg, prefetch=False)
        assert train.size == 8 and test.size == 2

    def test_ndc_rays_finite(self, llff_dir):
        cfg = default_config(dataset="llff", data_dir=llff_dir, batch_size=8, factor=0)
        ds = get_dataset("train", cfg, prefetch=False)
        batch = next(ds)
        for field in batch["rays"]:
            assert np.isfinite(field).all()

    def test_render_path_rays(self, llff_dir):
        cfg = default_config(
            dataset="llff", data_dir=llff_dir, batch_size=8, factor=0, render_path=True
        )
        ds = get_dataset("test", cfg, prefetch=False)
        case = next(ds)
        assert "pixels" not in case
        assert case["rays"].origins.shape == (32, 32, 3)

    def test_spherify(self, llff_dir):
        cfg = default_config(
            dataset="llff", data_dir=llff_dir, batch_size=8, factor=0, spherify=True
        )
        ds = get_dataset("test", cfg, prefetch=False)
        case = next(ds)
        assert np.isfinite(case["rays"].origins).all()
