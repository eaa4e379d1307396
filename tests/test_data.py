"""Dataset loaders, ray generation, NDC, synthetic scene round-trips."""

import numpy as np
import pytest

from plenoctree_tpu.data import generate_rays, convert_to_ndc, get_dataset
from plenoctree_tpu.data.poses import pose_spherical, recenter_poses, spiral_path
from plenoctree_tpu.data.synthetic import (
    render_synthetic_scene,
    scene_sigma_rgb,
    write_blender_dataset,
)
from plenoctree_tpu.utils.config import default_config


class TestRays:
    def test_center_pixel_points_forward(self):
        c2w = np.eye(4, dtype=np.float32)[None]
        rays = generate_rays(4, 4, 10.0, c2w)
        assert rays.origins.shape == (1, 4, 4, 3)
        # Camera at origin looking down -z.
        np.testing.assert_allclose(rays.origins, 0.0)
        assert (rays.directions[..., 2] < 0).all()
        np.testing.assert_allclose(
            np.linalg.norm(rays.viewdirs, axis=-1), 1.0, atol=1e-6
        )

    def test_pose_rotation_applies(self):
        c2w = pose_spherical(45.0, -30.0, 4.0)[None]
        rays = generate_rays(8, 8, 20.0, c2w)
        np.testing.assert_allclose(rays.origins[0, 0, 0], c2w[0, :3, 3], atol=1e-6)

    def test_ndc_maps_into_unit_cube(self):
        c2w = np.eye(4, dtype=np.float32)[None]
        rays = generate_rays(16, 16, 20.0, c2w)
        o, d = convert_to_ndc(
            rays.origins.reshape(-1, 3), rays.directions.reshape(-1, 3), 20.0, 16, 16
        )
        # At the near plane z=1; moving along d approaches z=1... -> o2 + d2 in [-1, 1]
        assert np.isfinite(o).all() and np.isfinite(d).all()
        np.testing.assert_array_less(np.abs(o[:, 2] + d[:, 2]), 1.0 + 1e-5)


class TestPoses:
    def test_pose_spherical_radius(self):
        c2w = pose_spherical(30.0, -45.0, 5.0)
        np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 5.0, atol=1e-5)

    def test_recenter_poses_centers(self):
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(3, 5, dtype=np.float32)[None], (6, 1, 1))
        poses[:, :3, 3] = rng.normal(size=(6, 3)) + 5.0
        poses[:, :3, 4] = [[100, 100, 50.0]] * 6
        out = recenter_poses(poses)
        assert np.abs(out[:, :3, 3].mean(0)).max() < 2.0

    def test_spiral_path_shape(self):
        poses = np.tile(np.eye(3, 5, dtype=np.float32)[None], (6, 1, 1))
        poses[:, 2, 3] = np.linspace(0.1, 0.2, 6)
        poses[:, :3, 4] = [[100, 100, 50.0]] * 6
        bds = np.array([[1.0, 5.0]] * 6)
        rp = spiral_path(poses, bds)
        assert rp.shape == (120, 3, 4)


class TestSynthetic:
    def test_scene_field(self):
        sigma, rgb = scene_sigma_rgb(np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]]))
        assert sigma[0] > 10.0  # inside the central blob
        assert sigma[1] < 1e-3  # far outside
        assert rgb.shape == (2, 3)

    def test_render_views(self):
        images, c2ws, focal = render_synthetic_scene(
            "train", 3, 32, True, near=2.0, far=6.0
        )
        assert images.shape == (3, 32, 32, 3)
        assert c2ws.shape == (3, 4, 4)
        # White background + visible object: mean below 1, corners ~white.
        assert 0.3 < images.mean() < 0.99
        assert images[:, 0, 0].mean() > 0.95

    def test_dataset_iterates(self):
        cfg = default_config(dataset="synthetic", batch_size=32, factor=0)
        ds = get_dataset("train", cfg, prefetch=False)
        batch = next(ds)
        assert batch["pixels"].shape == (32, 3)
        assert batch["rays"].origins.shape == (32, 3)
        test_ds = get_dataset("test", cfg, prefetch=False)
        ex = next(test_ds)
        assert ex["pixels"].shape == (64, 64, 3)
        assert ex["rays"].origins.shape == (64, 64, 3)

    def test_prefetch_thread(self):
        cfg = default_config(dataset="synthetic", batch_size=16, factor=0)
        ds = get_dataset("train", cfg, prefetch=True)
        for _ in range(5):
            batch = next(ds)
        assert batch["pixels"].shape == (16, 3)

    def test_peek_is_nonconsuming_queue_front(self):
        # Reference semantics (nerf_sh/nerf/datasets.py::peek): repeated
        # peeks return the SAME batch, and the next __next__ yields it.
        import numpy as np

        cfg = default_config(dataset="synthetic", batch_size=16, factor=0)
        for prefetch in (False, True):
            ds = get_dataset("train", cfg, prefetch=prefetch)
            a = ds.peek()
            b = ds.peek()
            c = next(ds)
            np.testing.assert_array_equal(a["pixels"], b["pixels"])
            np.testing.assert_array_equal(a["pixels"], c["pixels"])
            d = next(ds)  # and the held batch is consumed exactly once
            assert not np.array_equal(a["pixels"], d["pixels"])


class TestBlenderRoundtrip:
    def test_write_and_load(self, tmp_path):
        out = write_blender_dataset(str(tmp_path), n_train=3, n_test=2, resolution=16)
        cfg = default_config(
            dataset="blender", data_dir=out, batch_size=8, factor=0
        )
        ds = get_dataset("train", cfg, prefetch=False)
        assert ds.size == 3
        assert ds.h == ds.w == 16
        batch = next(ds)
        assert batch["pixels"].shape == (8, 3)
        # Pixels come back within quantization error of the analytic render.
        images, _, _ = render_synthetic_scene("train", 3, 16, True, 2.0, 6.0)
        assert np.abs(ds.images.reshape(3, 16, 16, 3) - images).max() < 0.01

    def test_factor2(self, tmp_path):
        out = write_blender_dataset(str(tmp_path), n_train=2, n_test=1, resolution=16)
        cfg = default_config(dataset="blender", data_dir=out, batch_size=4, factor=2)
        ds = get_dataset("test", cfg, prefetch=False)
        assert ds.h == ds.w == 8
