"""Differentiable PlenOctree volume renderer (pure XLA path).

TPU-native replacement for svox.VolumeRenderer/_VolumeRenderFunction (CUDA,
see SURVEY.md §2.1 and octree/optimization.py:174-226): per-ray leaf-adaptive
ray marching expressed as lax.scan whose every step does a branch-free
fixed-depth tree descent (pure gathers — no data-dependent control flow, so
XLA vectorizes it across the whole ray batch).

Semantics match the svox renderer:
  * rays are transformed into tree coords; delta_scale converts tree-space
    path lengths back to world lengths for the attenuation integral;
  * each segment covers exactly one leaf: delta_t = (cube exit - t) + eps
    with eps = `step_size` (1e-3 fast / 1e-5 high quality ladder,
    octree/nerf/utils.py:211-215);
  * colors decode per-ray basis (SH/SG evaluated at the world view direction,
    sigmoid-activated; RGBA raw) and sigma is clamped at 0 (svox skips
    sigma <= sigma_thresh);
  * remaining transmittance composites onto `background_brightness`;
  * `fast` mode raises sigma/stop thresholds like svox render_persp(fast=).

Two execution modes:
  * training (`render_rays`): one fixed-length scan, differentiable w.r.t.
    leaf data through the gathers (scatter-add transpose by JAX AD); the
    step is rematerialized so residuals stay O(rays * carry);
  * evaluation (`VolumeRenderer.render_persp`): short scan passes with a
    host-checked global early-termination between passes — rays that leave
    the volume or saturate opacity stop costing compute at pass granularity.
"""

import functools
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from plenoctree_tpu.ops.sh import sh_basis


@dataclass(frozen=True)
class RenderOptions:
    """Parity: svox RenderOptions (octree/extraction.py:184-188)."""

    step_size: float = 1e-4
    background_brightness: float = 1.0
    stop_thresh: float = 0.0  # transmittance early-stop (fast mode: 1e-2)
    sigma_thresh: float = 0.0  # skip leaves with sigma below (fast: 1e-2)
    max_segments: int = 256  # scan length bound (training path)


MAX_ACCEL_RESO = 512  # hard cap on grid side length
ACCEL_BYTES_BUDGET = 160 * 1024 * 1024  # HBM budget for the dense i32 grid
# Gather cost on this chip RISES with table size (measured ~9 ns/row at
# 8 MB vs ~59 ns/row at 235 MB — scripts/bench_gather.py), so a smaller
# grid + short in-kernel descent usually beats a full-depth grid anyway.


def accel_grid_level(tree, bytes_budget=None):
    """Choose the accel grid level k (reso = N**k) within the HBM budget.

    Full depth needs k = max_depth + 1; when that grid exceeds the budget or
    MAX_ACCEL_RESO, drop k until it fits — voxels that still contain deeper
    subtrees then store an internal-node pointer and the renderer finishes
    with a short per-step descent (see _march step in march.py).
    """
    bytes_budget = bytes_budget or ACCEL_BYTES_BUDGET
    k = tree.max_depth + 1
    while k > 1 and (
        tree.N**k > MAX_ACCEL_RESO or 4 * tree.N ** (3 * k) > bytes_budget
    ):
        k -= 1
    return k


def build_accel_grid(tree, bytes_budget=None):
    """Dense pointer grid: one i32 gather replaces the per-step tree descent.

    Word encoding (i32), indexed by voxel at reso = N**k:
      >= 0: containing LEAF — (flat_cell_index << 6) | leaf_node_depth
      <  0: voxel holds a deeper subtree — -(node_id + 1); the renderer
            descends from that node for the remaining depth_limit+1-k levels.

    Returns (grid [reso^3] int32, reso, k).
    """
    k = accel_grid_level(tree, bytes_budget)
    reso = tree.N**k
    n_cells = tree.n_internal * tree.N**3
    if n_cells >= 1 << 25:
        raise ValueError(
            f"tree has {n_cells} cells; leaf words need cell < 2^25 "
            "(shrink the tree or extend the accel word to int64)"
        )
    arr = (np.arange(reso, dtype=np.float64) + 0.5) / reso
    grid = np.empty(reso * reso * reso, np.int32)
    block = max(1, (2**22) // (reso * reso))
    for x0 in range(0, reso, block):
        xs = arr[x0 : x0 + block]
        pts = np.stack(
            np.meshgrid(xs, arr, arr, indexing="ij"), axis=-1
        ).reshape(-1, 3)
        node, cell, depth, internal = _query_capped(tree, pts, k)
        flat = (
            node * tree.N**3
            + (cell[:, 0] * tree.N + cell[:, 1]) * tree.N
            + cell[:, 2]
        )
        word = np.where(
            internal, -(node + 1), (flat << 6) | depth.astype(np.int64)
        ).astype(np.int32)
        grid[x0 * reso * reso : x0 * reso * reso + pts.shape[0]] = word
    return grid, reso, k


def _query_capped(tree, pts, k):
    """Locate each point's leaf, descending at most k-1 node levels.

    Returns (node, cell_ijk, depth, internal): when `internal` is set, the
    point's voxel (at reso N**k) contains a subtree rooted at child node
    `node` (depth k) rather than a single leaf cell.
    """
    N = tree.N
    t = np.clip(np.asarray(pts, np.float64), 0.0, 1.0 - 1e-9)
    node = np.zeros(t.shape[0], dtype=np.int64)
    pos = t.copy()
    for _ in range(max(k - 1, 0)):
        idx = np.minimum((pos * N).astype(np.int64), N - 1)
        rel = tree.child[node, idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int64)
        live = rel != 0
        node = np.where(live, node + rel, node)
        pos = np.where(live[:, None], pos * N - idx, pos)
    idx = np.minimum((pos * N).astype(np.int64), N - 1)
    rel = tree.child[node, idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int64)
    internal = rel != 0
    depth = tree.parent_depth[node, 1].astype(np.int64)
    return np.where(internal, node + rel, node), idx, depth, internal


def tree_arrays(tree, accel=True, bytes_budget=None):
    """Flatten an N3Tree into device arrays for rendering.

    Returns a dict pytree:
      child  [n*N^3]  int32 absolute child node id, -1 for leaf
      data   [n*N^3, data_dim] float32 (color coeffs + sigma)
      sigma  [n*N^3] float32 — sigma-only marching table; phase-1 marching
             gathers this instead of the ~50x wider `data` rows (gather cost
             scales with table footprint on this chip)
      offset/invradius [3]
      extra_data (SG lambda/mu) or None
      accel  [reso^3] int32 pointer grid (see build_accel_grid), accel_reso,
      accel_level k, N, depth_limit (static ints)
    """
    n = tree.n_internal
    child_rel = tree.child[:n].reshape(n, -1).astype(np.int64)
    node_ids = np.arange(n, dtype=np.int64)[:, None]
    child_abs = np.where(child_rel == 0, -1, child_rel + node_ids)
    data = tree.data[:n].reshape(n * tree.N**3, tree.data_dim).astype(np.float32)
    out = {
        "child": jnp.asarray(child_abs.reshape(-1).astype(np.int32)),
        "data": jnp.asarray(data),
        "sigma": jnp.asarray(np.ascontiguousarray(data[:, -1])),
        "offset": jnp.asarray(tree.offset, jnp.float32),
        "invradius": jnp.asarray(tree.invradius, jnp.float32),
        "extra_data": None
        if tree.extra_data is None
        else jnp.asarray(tree.extra_data, jnp.float32),
        "accel": None,
        "accel_reso": 0,
        "accel_level": 0,
        "N": int(tree.N),
        "depth_limit": int(tree.max_depth),
    }
    if accel:
        grid, reso, k = build_accel_grid(tree, bytes_budget)
        out["accel"] = jnp.asarray(grid)
        out["accel_reso"] = reso
        out["accel_level"] = k
    return out


def write_back_data(tree, data):
    """Write optimized flat leaf data back into the host tree."""
    n = tree.n_internal
    tree.data[:n] = np.asarray(data).reshape(n, tree.N, tree.N, tree.N, tree.data_dim)
    return tree


def _descend(child, pos, levels, N=2, node=None, corner=None, size=None):
    """Branch-free fixed-depth descent over `levels` levels. pos in [0,1)^3.

    Optionally starts from a given (node, corner, size) state — used by the
    budgeted accel grid, whose internal-pointer voxels leave a short residual
    descent (march.py). Returns (cell_flat_index, cube_corner, cube_size) of
    the containing leaf. Generic in branch factor N (svox parity:
    /root/reference/octree/extraction.py:100-105 exposes --tree_branch_n).
    """
    shape = pos.shape[:-1]
    node = jnp.zeros(shape, jnp.int32) if node is None else node
    corner = jnp.zeros_like(pos) if corner is None else corner
    size = jnp.ones(shape, pos.dtype) if size is None else size
    local = (pos - corner) / size[..., None]
    cell = jnp.zeros(shape, jnp.int32)
    done = jnp.zeros(shape, bool)
    n3 = N * N * N
    for _ in range(levels):
        idx = jnp.clip((local * N).astype(jnp.int32), 0, N - 1)
        flat = node * n3 + (idx[..., 0] * N + idx[..., 1]) * N + idx[..., 2]
        nxt = child[flat]
        is_leaf = nxt < 0
        newly_done = is_leaf & ~done
        cell = jnp.where(newly_done, flat, cell)
        corner = jnp.where(
            (~done)[..., None], corner + idx * (size[..., None] / N), corner
        )
        size = jnp.where(done, size, size / N)
        node = jnp.where(is_leaf | done, node, nxt)
        local = jnp.where((is_leaf | done)[..., None], local, local * N - idx)
        done = done | is_leaf
    return cell, corner, size


def _ray_basis(fmt, basis_dim, viewdirs, extra_data):
    """Per-ray color basis [R, basis_dim] from world view directions."""
    if fmt == "SH":
        deg = int(round(basis_dim**0.5)) - 1
        return sh_basis(deg, viewdirs)
    if fmt == "SG":
        sg_lambda = extra_data[:, 0]  # stored softplus-ed at extraction
        sg_mu = extra_data[:, 1:4]
        cosine = jnp.einsum("kj,rj->rk", sg_mu, viewdirs, precision="highest")
        return jnp.exp(sg_lambda[None, :] * (cosine - 1.0))
    return jnp.ones(viewdirs.shape[:-1] + (1,), viewdirs.dtype)


def _prep_rays(arrays, origins, dirs, fmt, basis_dim):
    """World rays -> tree-space marching state + per-ray color basis."""
    offset = arrays["offset"]
    invradius = arrays["invradius"]
    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    o = origins * invradius + offset
    d = viewdirs * invradius
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)  # world length per tree t
    dn = d * delta_scale[..., None]  # unit in tree space
    safe_dn = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
    t0 = (0.0 - o) / safe_dn
    t1 = (1.0 - o) / safe_dn
    tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0) + 1e-5
    tmax = jnp.min(jnp.maximum(t0, t1), -1) - 1e-5
    basis = _ray_basis(fmt, basis_dim, viewdirs, arrays.get("extra_data"))
    return o, dn, safe_dn, delta_scale, tmin, tmax, basis


@dataclass(frozen=True)
class TreeMeta:
    """Static tree facts, kept out of traced pytrees (jit-hashable)."""

    N: int
    depth_limit: int
    accel_reso: int
    accel_level: int


def split_arrays(arrays):
    """(tables, meta): device-array-only pytree + hashable static meta."""
    meta = TreeMeta(
        arrays["N"],
        arrays["depth_limit"],
        arrays["accel_reso"],
        arrays["accel_level"],
    )
    tables = {
        k: v
        for k, v in arrays.items()
        if k not in ("N", "depth_limit", "accel_reso", "accel_level")
    }
    return tables, meta


def _cell_size_from_depth(depth, N, dtype):
    e = -(depth + 1).astype(dtype)
    if N == 2:
        return jnp.exp2(e)
    return jnp.exp(e * float(np.log(N)))


def _locate(tables, meta, pos):
    """(cell, corner, size) of the leaf containing pos, via the accel grid.

    One i32 gather for voxels whose leaf is at/above the grid level; a short
    residual `_descend` (depth_limit+1-k gathers) where the tree is deeper
    than the budgeted grid. Without a grid, a full-depth descent.
    """
    arrays = tables
    N = meta.N
    depth_limit = meta.depth_limit
    accel = arrays.get("accel")
    if accel is None:
        return _descend(arrays["child"], pos, depth_limit + 1, N)
    reso = meta.accel_reso
    k = meta.accel_level
    v = jnp.clip((pos * reso).astype(jnp.int32), 0, reso - 1)
    word = accel[(v[..., 0] * reso + v[..., 1]) * reso + v[..., 2]]
    cell = (word >> 6).astype(jnp.int32)
    depth = (word & 63).astype(jnp.int32)
    size = _cell_size_from_depth(depth, N, pos.dtype)
    corner = jnp.floor(pos / size[..., None]) * size[..., None]
    residual = depth_limit + 1 - k
    if residual <= 0:
        return cell, corner, size
    # Voxels holding subtrees: word < 0 encodes -(node+1) at level k.
    vsize = jnp.full(pos.shape[:-1], 1.0 / reso, pos.dtype)
    vcorner = v.astype(pos.dtype) / reso
    dcell, dcorner, dsize = _descend(
        arrays["child"],
        pos,
        residual,
        N,
        node=jnp.where(word < 0, -word - 1, 0),
        corner=vcorner,
        size=vsize,
    )
    is_int = word < 0
    return (
        jnp.where(is_int, dcell, cell),
        jnp.where(is_int[..., None], dcorner, corner),
        jnp.where(is_int, dsize, size),
    )


def _make_step(arrays, rp, fmt, basis_dim, depth_limit, opts):
    """One leaf segment: carry (t, light, accum) -> carry."""
    del depth_limit  # static tree facts now live in arrays
    data = arrays["data"]
    tables, meta = split_arrays(arrays)
    o, dn, safe_dn, delta_scale, _, tmax, basis = rp
    n_channels = (data.shape[-1] - 1) // basis_dim

    def step(carry, _):
        t, light, accum = carry
        pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
        cell, corner, size = _locate(tables, meta, pos)

        # Distance to the leaf cube's exit plane along the ray. Keyed off
        # safe_dn, NOT dn: a zero component substitutes +1e-9 in safe_dn,
        # and (dn > 0) would pick the near plane for it — t_exit collapses
        # to ~0 and exactly-axis-aligned rays (every NDC center ray)
        # crawl at step_size and composite nothing.
        far_planes = corner + (safe_dn > 0) * size[..., None]
        t_exit = jnp.min((far_planes - pos) / safe_dn, axis=-1)
        delta_t = jnp.maximum(t_exit, 0.0) + opts.step_size

        active = (t <= tmax) & (light > opts.stop_thresh)
        vals = data[cell]  # [R, data_dim]
        sigma = jnp.maximum(vals[..., -1], 0.0)
        sigma = jnp.where(sigma >= opts.sigma_thresh, sigma, 0.0)
        att = jnp.exp(-delta_t * delta_scale * sigma)
        weight = jnp.where(active, light * (1.0 - att), 0.0)

        coeffs = vals[..., :-1].reshape(vals.shape[:-1] + (n_channels, basis_dim))
        raw = jnp.einsum("...ck,...k->...c", coeffs, basis, precision="highest")
        rgb = jax.nn.sigmoid(raw) if fmt in ("SH", "SG") else raw

        accum = accum + weight[..., None] * rgb
        light = jnp.where(active, light * att, light)
        t = jnp.where(active, t + delta_t, t)
        return (t, light, accum), None

    return step, n_channels


def render_rays(arrays, origins, dirs, fmt, basis_dim, depth_limit, opts):
    """Render rays with one fixed-length scan (differentiable path).

    Args:
      arrays: dict from `tree_arrays` (data may be a traced/optimized array).
      origins, dirs: [R, 3] world-space rays (dirs need not be unit).
      fmt: "SH" | "SG" | "RGBA".
      basis_dim: basis function count per channel.
      depth_limit: static tree depth bound for the descent unroll.
      opts: RenderOptions.

    Returns:
      rgb [R, 3].
    """
    rp = _prep_rays(arrays, origins, dirs, fmt, basis_dim)
    step, n_channels = _make_step(arrays, rp, fmt, basis_dim, depth_limit, opts)
    init = (
        rp[4],  # tmin
        jnp.ones_like(rp[4]),
        jnp.zeros(origins.shape[:-1] + (n_channels,), jnp.float32),
    )
    (t, light, accum), _ = jax.lax.scan(
        jax.checkpoint(step), init, None, length=opts.max_segments
    )
    return accum + light[..., None] * opts.background_brightness


class VolumeRenderer:
    """Convenience wrapper mirroring svox.VolumeRenderer's API surface.

    Holds the host tree + device arrays; `render_persp(c2w, ...)` renders a
    full pinhole image through the two-phase deferred pipeline (march.py)
    with pass-level early termination + ray compaction. The differentiable
    path is march + shade with a traced `data` (see octree/optimize.py);
    `render_rays` above is the single-scan parity oracle.
    """

    def __init__(
        self,
        tree,
        step_size=1e-4,
        ndc=None,
        background_brightness=1.0,
        segs_per_pass=48,
        max_segments=None,
        contrib_slots=None,
        accel_bytes_budget=None,
    ):
        self.tree = tree
        self.arrays = tree_arrays(tree, bytes_budget=accel_bytes_budget)
        self.ndc = ndc
        self.opts = RenderOptions(
            step_size=step_size,
            background_brightness=background_brightness,
            max_segments=max_segments or default_max_segments(tree),
        )
        self.fmt = tree.data_format.format
        self.basis_dim = tree.data_format.basis_dim
        self.depth_limit = int(tree.max_depth)
        self.segs_per_pass = segs_per_pass
        if contrib_slots is None:
            # Upfront K sizing from occupancy columns (VERDICT r3 #10): the
            # sticky-regrowth backstop stays, but dense volumetric trees no
            # longer pay a re-march per doubling to find their K.
            from plenoctree_tpu.octree.march import estimate_contrib_slots

            contrib_slots = estimate_contrib_slots(tree, self.opts.sigma_thresh)
        self.contrib_slots = contrib_slots
        self._deferred = {}

    def _get_deferred(self, fast):
        if fast not in self._deferred:
            from plenoctree_tpu.octree.march import DeferredRenderer

            opts = self.opts
            if fast:
                opts = replace(opts, sigma_thresh=1e-2, stop_thresh=1e-2)
            self._deferred[fast] = DeferredRenderer(
                self.arrays,
                self.fmt,
                self.basis_dim,
                opts,
                K=self.contrib_slots,
            )
        return self._deferred[fast]

    def render_rays_early_stop(self, origins, dirs, fast=False):
        """Render [R, 3] rays via the deferred pipeline (see march.py)."""
        renderer = self._get_deferred(fast)
        # 1x + 4x + 11x = one 16x budget in exactly three dispatches (the
        # default budget, 1.5 * N^(depth+1), is a multiple of 16 * 48 for the
        # depth-8 blender trees). Static caps keep the compile set tiny.
        schedule = (self.segs_per_pass, 4 * self.segs_per_pass, 11 * self.segs_per_pass)
        return renderer.render_chunk(
            np.asarray(origins, np.float32),
            np.asarray(dirs, np.float32),
            pass_schedule=schedule,
        )

    def render_persp(self, c2w, height, width, fx, fy=None, fast=False, chunk=65536):
        from plenoctree_tpu.data.rays import generate_rays

        rays = generate_rays(width, height, fx, np.asarray(c2w)[None])
        origins = rays.origins.reshape(-1, 3)
        dirs = rays.directions.reshape(-1, 3)
        if self.ndc is not None:
            from plenoctree_tpu.data.rays import convert_to_ndc

            origins, dirs = convert_to_ndc(
                origins, dirs, self.ndc["focal"], self.ndc["width"], self.ndc["height"]
            )
        n = origins.shape[0]
        chunk = min(chunk, n)
        outs = []
        for i in range(0, n, chunk):
            o = origins[i : i + chunk]
            d = dirs[i : i + chunk]
            pad = chunk - o.shape[0]
            if pad:
                o = np.pad(o, ((0, pad), (0, 0)), mode="edge")
                d = np.pad(d, ((0, pad), (0, 0)), mode="edge")
            out = self.render_rays_early_stop(o, d, fast=fast)
            outs.append(out[: chunk - pad] if pad else out)
        return np.concatenate(outs, 0).reshape(height, width, -1)


def default_max_segments(tree):
    """Scan length bound: enough segments to cross the deepest grid 1.5x."""
    return int(1.5 * tree.N ** (tree.max_depth + 1))


def make_ndc_config(width, height, focal):
    return {"width": width, "height": height, "focal": focal}
