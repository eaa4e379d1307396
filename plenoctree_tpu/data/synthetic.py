"""Procedural analytic test scene.

Defines a smooth density/color field (a cluster of gaussian blobs with
distinct colors inside the unit box) and renders ground-truth images by dense
quadrature of the volumetric rendering integral along camera rays — the same
compositing semantics the NeRF model optimizes, so training on these images
must converge. Used by the `synthetic` dataset, tests and bench.py so the
full pipeline runs with zero external data.
"""

import numpy as np

from plenoctree_tpu.data.poses import pose_spherical
from plenoctree_tpu.data.rays import generate_rays

# Blob centers / radii / colors (inside [-1, 1]^3).
_BLOBS = np.array(
    [
        # x      y      z     radius   r    g    b    density
        [0.0, 0.0, 0.0, 0.45, 0.9, 0.2, 0.2, 40.0],
        [0.55, 0.0, 0.25, 0.28, 0.2, 0.85, 0.3, 50.0],
        [-0.5, 0.3, -0.2, 0.3, 0.25, 0.35, 0.95, 45.0],
        [0.1, -0.55, 0.4, 0.22, 0.95, 0.85, 0.2, 60.0],
    ],
    dtype=np.float32,
)


def scene_sigma_rgb(points, density_scale=1.0):
    """Analytic (sigma, rgb) of the test scene at [..., 3] points.

    density_scale multiplies every blob's density: 1.0 (default) is a soft
    translucent-fog scene; >=8 makes blob fronts optically thick within a
    ~0.02 shell, i.e. surface-like occupancy — the class the reference's
    blender scenes are in, where visibility masking prunes interiors."""
    points = np.asarray(points, dtype=np.float32)
    sigma = np.zeros(points.shape[:-1], dtype=np.float32)
    rgb_accum = np.zeros(points.shape[:-1] + (3,), dtype=np.float32)
    for cx, cy, cz, rad, r, g, b, dens in _BLOBS:
        dens = dens * density_scale
        d2 = ((points - np.array([cx, cy, cz])) ** 2).sum(-1)
        w = dens * np.exp(-d2 / (2 * (rad / 2.0) ** 2)).astype(np.float32)
        sigma += w
        rgb_accum += w[..., None] * np.array([r, g, b], dtype=np.float32)
    rgb = rgb_accum / np.maximum(sigma[..., None], 1e-8)
    rgb = np.where(sigma[..., None] > 1e-6, rgb, 0.5)
    return sigma, rgb.astype(np.float32)


def render_rays_analytic(origins, directions, near, far, n_samples=192, white_bkgd=True,
                         density_scale=1.0):
    """Dense-quadrature volumetric render of the analytic scene."""
    t = np.linspace(near, far, n_samples, dtype=np.float32)
    pts = origins[..., None, :] + t[:, None] * directions[..., None, :]
    sigma, rgb = scene_sigma_rgb(pts, density_scale)
    dists = np.diff(t, append=t[-1] + (t[-1] - t[-2]))
    dists = dists * np.linalg.norm(directions, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans
    comp = (weights[..., None] * rgb).sum(-2)
    acc = weights.sum(-1)
    if white_bkgd:
        comp = comp + (1.0 - acc[..., None])
    return np.clip(comp, 0.0, 1.0).astype(np.float32)


def render_synthetic_scene(split, n_views, resolution, white_bkgd, near, far,
                           density_scale=1.0):
    """Render n_views orbit cameras at `resolution`^2; returns
    (images [N,H,W,3], camtoworlds [N,4,4], focal)."""
    radius = 3.2
    # Train views sweep the elevation band that contains the held-out
    # splits (real blender captures cover the upper hemisphere too) —
    # otherwise test views sit in pure-extrapolation territory and NeRF
    # floaters dominate the metric.
    offset = {"train": 0.0, "val": 9.0, "test": 15.0}.get(split, 15.0)
    thetas = np.linspace(0, 360, n_views, endpoint=False) + offset
    if split == "train":
        # Fixed-seed permutation: full elevation coverage for ANY n_views
        # (a stride pattern aliases when gcd(stride, n_views) > 1) and
        # decorrelated from the linear azimuth sweep.
        perm = np.random.default_rng(11).permutation(n_views)
        phis = -45.0 + 37.0 * perm / max(n_views - 1, 1)
    else:
        phis = np.full(n_views, {"val": -32.0}.get(split, -40.0))
    camtoworlds = np.stack(
        [pose_spherical(th, ph, radius) for th, ph in zip(thetas, phis)], axis=0
    ).astype(np.float32)
    focal = 1.1 * resolution
    rays = generate_rays(resolution, resolution, focal, camtoworlds)
    images = render_rays_analytic(
        rays.origins.reshape(-1, 3),
        rays.directions.reshape(-1, 3),
        near,
        far,
        white_bkgd=white_bkgd,
        density_scale=density_scale,
    ).reshape(n_views, resolution, resolution, 3)
    return images, camtoworlds, focal


def write_nsvf_dataset(out_dir, n_train=8, n_test=3, resolution=48, white_bkgd=True):
    """Materialize the synthetic scene in NSVF layout (intrinsics.txt +
    pose/ + rgb/ + bbox.txt) for NSVF-loader and --bbox_from_data tests."""
    import os

    from PIL import Image

    os.makedirs(os.path.join(out_dir, "pose"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    focal = 1.1 * resolution
    K = np.eye(4)
    K[0, 0] = K[1, 1] = focal
    K[0, 2] = K[1, 2] = resolution / 2
    np.savetxt(os.path.join(out_dir, "intrinsics.txt"), K)
    # Scene bbox: blobs live within ~[-0.9, 0.9].
    np.savetxt(
        os.path.join(out_dir, "bbox.txt"),
        np.array([[-1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 0.01]]),
    )
    cam_trans = np.diag(np.array([1, -1, -1, 1], dtype=np.float32))
    for split, prefix, n in (("train", "0", n_train), ("test", "1", n_test)):
        images, c2ws, _ = render_synthetic_scene(
            split, n, resolution, white_bkgd, near=2.0, far=6.0
        )
        for i in range(n):
            name = f"{prefix}_{i:04d}"
            img = (images[i] * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out_dir, "rgb", name + ".png"))
            # Loader right-multiplies by cam_trans (its own inverse).
            np.savetxt(
                os.path.join(out_dir, "pose", name + ".txt"),
                c2ws[i] @ cam_trans,
            )
    return out_dir


def write_llff_dataset(out_dir, n_views=10, resolution=32):
    """Materialize a forward-facing capture in LLFF layout (images/ +
    poses_bounds.npy) for LLFF-loader/NDC tests. Cameras look down -z from
    z ~ 4 with small lateral offsets (forward-facing geometry)."""
    import os

    from PIL import Image

    imgdir = os.path.join(out_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    focal = 1.2 * resolution
    rows = []
    rng = np.random.default_rng(7)
    from plenoctree_tpu.data.rays import generate_rays

    from plenoctree_tpu.data.poses import viewmatrix

    for i in range(n_views):
        c2w = np.eye(4, dtype=np.float32)
        pos = np.array(
            [0.4 * rng.standard_normal(), 0.4 * rng.standard_normal(), 4.0],
            dtype=np.float32,
        )
        # Slightly jittered back-axis so camera axes aren't all parallel
        # (spherify's closest-point solve needs a nonsingular system).
        back = np.array(
            [0.05 * rng.standard_normal(), 0.05 * rng.standard_normal(), 1.0],
            dtype=np.float32,
        )
        c2w[:3, :4] = viewmatrix(back, np.array([0.0, 1.0, 0.0]), pos)
        rays = generate_rays(resolution, resolution, focal, c2w[None])
        img = render_rays_analytic(
            rays.origins.reshape(-1, 3), rays.directions.reshape(-1, 3), 1.0, 8.0
        ).reshape(resolution, resolution, 3)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(imgdir, f"img_{i:03d}.png")
        )
        r = c2w[:3, :3]
        # LLFF storage convention: loader maps rows [s1, -s0, s2] -> c2w.
        stored = np.stack([-r[1], r[0], r[2]], axis=0)
        m = np.concatenate(
            [stored, c2w[:3, 3:4], np.array([[resolution], [resolution], [focal]])],
            axis=1,
        )
        rows.append(np.concatenate([m.reshape(-1), [2.0, 7.0]]))
    np.save(os.path.join(out_dir, "poses_bounds.npy"), np.stack(rows))
    return out_dir


def write_blender_dataset(out_dir, n_train=12, n_test=4, resolution=64, white_bkgd=True,
                          density_scale=1.0):
    """Materialize the synthetic scene as an on-disk Blender-format dataset
    (transforms_{split}.json + PNGs) for end-to-end CLI tests."""
    import json
    import os

    from PIL import Image

    camera_angle_x = 2.0 * np.arctan(0.5 * resolution / (1.1 * resolution))
    for split, n in (("train", n_train), ("test", n_test), ("val", n_test)):
        images, c2ws, _ = render_synthetic_scene(
            split, n, resolution, white_bkgd, near=2.0, far=6.0,
            density_scale=density_scale,
        )
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        frames = []
        for i in range(n):
            rel = f"./{split}/r_{i}"
            img = (images[i] * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out_dir, f"{rel}.png"))
            frames.append(
                {"file_path": rel, "transform_matrix": c2ws[i].tolist()}
            )
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x), "frames": frames}, f)
    return out_dir
