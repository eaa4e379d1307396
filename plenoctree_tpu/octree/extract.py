"""NeRF -> PlenOctree extraction pipeline (library).

Parity with octree/extraction.py: auto_scale (:244-286), step1 grid eval +
sigma/weight masking + refinement (:288-353), step2 antialiased leaf fill
(:355-394), project_nerf_to_sh (:217-241). The NeRF queries run through the
sharded chunked `engine.eval_points` path on the mesh; tree bookkeeping is
host numpy (SURVEY.md §7 step 6).
"""

import numpy as np

from plenoctree_tpu import engine
from plenoctree_tpu.octree.grid_weight import calculate_grid_weights
from plenoctree_tpu.ops import sh_project
from plenoctree_tpu.utils.io import host0_print as h0print

# Device dispatches go through the (possibly remote) runtime with ~0.1-0.5 s
# round-trip latency each, so point evals use large chunks and a small
# in-flight pipeline instead of the reference's synchronous 8192-point loop
# (octree/extraction.py:300-312). 2^17 points x 3 f32 is ~1.5 MB per upload.
_POINT_CHUNK = 131072
_PIPELINE_DEPTH = 8


def _point_chunk(cfg):
    return max(int(getattr(cfg, "point_chunk", 0) or 0), 0) or max(
        cfg.chunk, _POINT_CHUNK
    )


def _grid_points(reso, offset, invradius, z_min=None, z_max=None):
    """World-coord centers of a reso^3 grid covering the tree volume."""
    arr = (np.arange(0, reso, dtype=np.float32) + 0.5) / reso
    xx = (arr - offset[0]) / invradius[0]
    yy = (arr - offset[1]) / invradius[1]
    zz = (arr - offset[2]) / invradius[2]
    if z_min is not None:
        zz = zz[zz >= z_min]
    if z_max is not None:
        zz = zz[zz <= z_max]
    grid = np.stack(np.meshgrid(xx, yy, zz, indexing="ij"), axis=-1).reshape(-1, 3)
    return grid


def _eval_sigma(points_fn, grid, chunk, use_viewdirs, mesh=None):
    """Chunked sigma-only grid evaluation.

    Only the density channel leaves the device: the SH/SG coefficient output
    (48+ channels) is discarded by the masking stages, and host<->device
    bandwidth — not compute — dominates the 512^3 sweep otherwise.
    """
    import jax

    @jax.jit
    def sigma_only_jit(points, viewdirs):
        _, sigma = points_fn(points, viewdirs)
        return sigma[..., 0]

    def sigma_only_host(points, viewdirs):
        # Non-traceable points_fn (e.g. analytic test doubles).
        _, sigma = points_fn(points, viewdirs)
        return np.asarray(sigma)[..., 0]

    sigma_only = sigma_only_jit
    num = grid.shape[0]
    out = np.empty(num, np.float32)
    pending = []  # (i, n, device_or_host_array) — drain with a lag so the
    # device computes/transfers chunk k while the host prepares k+1..k+D.

    def drain(slot):
        i, n, arr = slot
        out[i : i + n] = np.asarray(arr)[:n]

    for i in range(0, num, chunk):
        pts = grid[i : i + chunk]
        n = pts.shape[0]
        if n < chunk:
            pts = np.pad(pts, ((0, chunk - n), (0, 0)), mode="edge")
        dirs = np.zeros_like(pts) if use_viewdirs else None
        try:
            pending.append((i, n, sigma_only(pts, dirs)))
        except jax.errors.TracerArrayConversionError:
            sigma_only = sigma_only_host
            pending.append((i, n, sigma_only(pts, dirs)))
        if len(pending) > _PIPELINE_DEPTH:
            drain(pending.pop(0))
    for slot in pending:
        drain(slot)
    return out


def auto_scale(cfg, center, radius, points_fn, mesh=None):
    """Shrink the bbox to the sigma support (parity: extraction.py:244-286)."""
    h0print("* Step 0: Auto scale")
    reso = 2**cfg.init_grid_depth
    radius = np.asarray(radius, np.float32)
    center = np.asarray(center, np.float32)
    scale = 0.5 / radius
    offset = 0.5 * (1.0 - center / radius)
    grid = _grid_points(reso, offset, scale, cfg.z_min, cfg.z_max)

    sigmas = _eval_sigma(points_fn, grid, _point_chunk(cfg), cfg.use_viewdirs, mesh)
    approx_delta = 2.0 / reso
    sigma_thresh = -np.log(1.0 - cfg.scale_alpha_thresh) / approx_delta
    mask = sigmas >= sigma_thresh
    grid = grid[mask]
    if grid.shape[0] == 0:
        h0print("  (no voxels above threshold; keeping original bbox)")
        return center.tolist(), radius.tolist()
    lc = grid.min(axis=0) - 0.5 / reso
    uc = grid.max(axis=0) + 0.5 / reso
    return ((lc + uc) * 0.5).tolist(), ((uc - lc) * 0.5).tolist()


def step1_build(cfg, tree, points_fn, dataset, mesh=None):
    """Dense grid eval -> sigma/weight mask -> refine to init_grid_depth."""
    h0print("* Step 1: Grid eval")
    reso = 2 ** (cfg.init_grid_depth + 1)
    grid = _grid_points(reso, tree.offset, tree.invradius, cfg.z_min, cfg.z_max)
    h0print("  init grid", grid.shape)

    sigmas = _eval_sigma(points_fn, grid, _point_chunk(cfg), cfg.use_viewdirs, mesh)
    approx_delta = 2.0 / reso
    sigma_thresh = -np.log(1.0 - cfg.alpha_thresh) / approx_delta

    if cfg.masking_mode == "sigma":
        mask = sigmas >= sigma_thresh
    elif cfg.masking_mode == "weight":
        h0print("* Calculating grid weights")
        grid_weights = calculate_grid_weights(
            dataset,
            np.maximum(sigmas, 0.0),
            reso,
            tree.invradius,
            tree.offset,
        )
        mask = grid_weights.reshape(-1) >= cfg.weight_thresh
    else:
        raise ValueError(f"unknown masking_mode {cfg.masking_mode}")

    grid = grid[mask]
    h0print("  masked grid", grid.shape)
    h0print("  Building octree")
    if tree.n_internal == 1:
        tree.build_from_points(grid, depth=cfg.init_grid_depth)
    else:
        for _ in range(cfg.init_grid_depth):
            tree.refine_points(grid)
    h0print(" ", tree)
    assert tree.max_depth == cfg.init_grid_depth
    return tree


def project_nerf_to_sh(points_fn_cross, sh_deg, points, projection_samples, rng=None):
    """Project a view-dependent NeRF's radiance to SH coefficients.

    Args:
      points_fn_cross: (points [P,3], dirs [D,3]) -> (raw_rgb [P,D,3], sigma).
      sh_deg: target SH degree.
      points: [P, 3].

    Returns:
      coeffs [P, 3*(sh_deg+1)^2], sigma [P, 1].
    """

    def spherical_fn(dirs):
        return points_fn_cross(points, dirs)

    coeffs, sigma = sh_project.project_function_nerf(
        sh_deg, spherical_fn, projection_samples, rng
    )
    return coeffs.reshape(points.shape[0], -1), np.asarray(sigma)


def _make_cell_reducer(cfg, tree, points_fn):
    """Device-side per-cell reducer: [C, S, 3] sample points -> [C, data_dim]
    averaged leaf payloads. Only the reduced payload crosses back to the
    host (S x less transfer than shipping every sample)."""
    import jax
    import jax.numpy as jnp

    is_rgba = tree.data_format.format == "RGBA"
    reso = 2 ** (cfg.init_grid_depth + 1)
    approx_delta = 2.0 / reso

    def reduce_cells(points):
        c, s = points.shape[0], points.shape[1]
        rgb, sigma = points_fn(points.reshape(-1, 3), None)
        rgb = rgb.reshape(c, s, -1)
        sigma = sigma.reshape(c, s, 1)
        if is_rgba:
            # Alpha-weighted color average (octree/extraction.py:377-388).
            sigma_avg = sigma.mean(axis=1)
            alpha = 1.0 - jnp.exp(-approx_delta * sigma)
            msum = alpha.sum(axis=1)
            rgb_avg = (rgb * alpha).sum(axis=1) / jnp.maximum(msum, 1e-12)
            rgb_avg = jnp.where(msum[..., :1] < 1e-3, 0.0, rgb_avg)
            return jnp.concatenate([rgb_avg, sigma_avg], axis=-1)
        return jnp.concatenate([rgb, sigma], axis=-1).mean(axis=1)

    return jax.jit(reduce_cells), reduce_cells


def step2_fill(cfg, tree, points_fn, points_fn_cross=None, mesh=None, rng=None):
    """Antialiased leaf fill: average `samples_per_cell` jittered NeRF
    samples per leaf (alpha-weighted for RGBA trees).

    Leaf geometry (corners/sizes) is computed ONCE up front — the naive
    per-chunk `leaf_sample_points` rescans the whole tree (O(L) nonzero +
    parent walks) every call — and device dispatches are pipelined so the
    host jitters chunk k+1 while the device evaluates chunk k.
    """
    h0print("* Step 2: AA", cfg.samples_per_cell)
    rng = rng or np.random.default_rng(20200823)
    S = cfg.samples_per_cell

    # Hoisted leaf scan: rows into tree.data + world-space corner/size.
    leaves_all = tree._leaf_nodes()
    depth_all = tree.parent_depth[leaves_all[:, 0], 1]
    sel = leaves_all[depth_all == tree.max_depth]
    corner = tree._cell_corner(sel).astype(np.float64)  # tree coords
    size = tree._cell_size(sel).astype(np.float64)

    if cfg.use_viewdirs:
        chunk_size = max(
            1, cfg.chunk // (S * max(cfg.projection_samples // 10, 1))
        )
    else:
        chunk_size = max(1, _point_chunk(cfg) // S)

    reducer, reducer_host = (
        _make_cell_reducer(cfg, tree, points_fn) if not cfg.use_viewdirs else (None, None)
    )

    def sample_chunk(lo, hi):
        u = rng.random((hi - lo, S, 3), dtype=np.float64)
        t = corner[lo:hi, None, :] + u * size[lo:hi, None, None]
        return tree.tree2world(t.astype(np.float32))

    def write(lo, hi, rgba):
        rows = sel[lo:hi]
        tree.data[rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]] = np.asarray(
            rgba
        )[: hi - lo].astype(tree.data.dtype)

    if not cfg.use_viewdirs:
        import jax

        pending = []
        for lo in range(0, sel.shape[0], chunk_size):
            hi = min(lo + chunk_size, sel.shape[0])
            points = sample_chunk(lo, hi)
            if hi - lo < chunk_size:  # pad tail to keep one compiled shape
                points = np.pad(
                    points, ((0, chunk_size - (hi - lo)), (0, 0), (0, 0)), mode="edge"
                )
            try:
                pending.append((lo, hi, reducer(points)))
            except jax.errors.TracerArrayConversionError:
                # Non-traceable points_fn (e.g. analytic test doubles).
                pending.append((lo, hi, reducer_host(points)))
            if len(pending) > _PIPELINE_DEPTH:
                write(*pending.pop(0))
        for slot in pending:
            write(*slot)
        return tree

    # Vanilla-NeRF path: Monte-Carlo SH projection (host-side reduce).
    for lo in range(0, sel.shape[0], chunk_size):
        hi = min(lo + chunk_size, sel.shape[0])
        points = sample_chunk(lo, hi).reshape(-1, 3)
        rgb, sigma = project_nerf_to_sh(
            points_fn_cross, cfg.sh_deg, points, cfg.projection_samples, rng
        )
        rgba = np.concatenate([rgb, sigma], axis=-1)
        rgba = rgba.reshape(-1, S, tree.data_dim).mean(axis=1)
        write(lo, hi, rgba)
    return tree
