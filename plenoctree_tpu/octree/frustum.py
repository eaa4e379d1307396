"""Tile-frustum PlenOctree renderer — the TPU-shaped serving path.

Reference capability: svox's CUDA render_persp + the C++ volrend viewer
(octree/nerf/utils.py:448-498; paper headline ~150 FPS @ 800x800 on V100).
Per-ray adaptive ray marching is gather-latency-bound on TPU (measured
~40 ns per ray-step with a data-dependent 2-3 gather chain, octree/march.py),
so this renderer restructures the whole computation around what the TPU does
well: contiguous slices and dense VPU/MXU math.

Design:
  * Leaves above the sigma threshold are binned (host-side, per scene) into a
    C^3 coarse grid, replicated into every coarse cell they overlap, and
    sorted by cell id. All per-frame accesses to leaf data become CONTIGUOUS
    dynamic slices of this array ("runs") — never per-ray gathers.
  * Phase 1 (per 16x16 pixel tile): walk the tile's frustum through the
    coarse grid slab-by-slab along the tile's dominant axis, collecting the
    (start, length) runs of every candidate cell in front-to-back slab order.
    The tiny CSR-header gathers here are the only random access per frame.
  * Phase 2 (per tile, scan over its runs): slice the run's leaf rows, test
    all 256 tile rays against all RUNCAP leaf cubes (dense VPU), decode
    colors with one [3*basis, basis]x[basis, 256] MXU matmul per run, and
    composite ORDER-INDEPENDENTLY: a hit's occlusion is
        occ = cumOD(previous slabs)  +  sum_{same run, t' < t} sigma'dt'
    which is exact because hit entry points are monotone in the dominant
    axis (so cross-slab order is exact) and the in-run pairwise term handles
    same-cell ordering exactly. Per-ray state is just (cumOD, rgb_acc) — no
    slot buffers, no sorting, no early-termination bookkeeping.
  * Duplicated leaf instances (a leaf overlapping several coarse cells) are
    deduplicated exactly: a hit only counts in the instance whose home cell
    contains the hit's entry point.

Remaining approximation vs the march oracle (octree/renderer.py::render_rays):
rays that cross BOTH lateral cell boundaries inside one slab can see two
same-slab runs in the wrong order; windows are enumerated along the tile's
lateral direction signs so the common single-boundary case is ordered
correctly. Tests pin the resulting error to noise level.

svox semantics preserved: sigma <= sigma_thresh cells contribute neither
color nor attenuation; dt = (exit - entry) + step_size eps; stop_thresh
masks contributions once transmittance falls below it; remaining light
composites onto background_brightness.
"""

import functools
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from plenoctree_tpu.octree.renderer import RenderOptions, _ray_basis

TILE = 16  # pixels per tile side (256 rays)


def build_leaf_index(tree, sigma_thresh=0.0, grid_c=32, runcap=64):
    """Host-side per-scene preprocessing.

    Returns dict with:
      soa   [L, 7 + data_dim] f32: lo(3) hi(3) home_cell(1, bitcast i32) data
      start [C^3] i32, count [C^3] i32 — CSR into soa rows
      meta: grid_c, runcap, smax (max splits per cell)
    Leaf instances are replicated per covered coarse cell and sorted by cell.
    """
    leaves = tree._leaf_nodes()
    corner = tree._cell_corner(leaves).astype(np.float64)
    size = tree._cell_size(leaves).astype(np.float64)
    data = tree.data[leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]].astype(
        np.float32
    )
    sigma = data[:, -1]
    keep = (sigma > 0.0) & (sigma >= sigma_thresh)
    corner, size, data = corner[keep], size[keep], data[keep]

    C = grid_c
    lo_cell = np.clip((corner * C).astype(np.int64), 0, C - 1)
    hi_cell = np.clip(
        np.ceil((corner + size[:, None]) * C).astype(np.int64) - 1, 0, C - 1
    )
    span = hi_cell - lo_cell + 1
    n_inst = span.prod(axis=1)
    total = int(n_inst.sum())

    # Expand instances (vectorized over the (dx,dy,dz) offset lattice).
    max_span = int(span.max()) if span.size else 1
    inst_leaf = []
    inst_cell = []
    for dx in range(max_span):
        for dy in range(max_span):
            for dz in range(max_span):
                m = (dx < span[:, 0]) & (dy < span[:, 1]) & (dz < span[:, 2])
                if not m.any():
                    continue
                idx = np.nonzero(m)[0]
                cell = (
                    (lo_cell[idx, 0] + dx) * C + (lo_cell[idx, 1] + dy)
                ) * C + (lo_cell[idx, 2] + dz)
                inst_leaf.append(idx)
                inst_cell.append(cell)
    inst_leaf = np.concatenate(inst_leaf) if inst_leaf else np.zeros(0, np.int64)
    inst_cell = np.concatenate(inst_cell) if inst_cell else np.zeros(0, np.int64)
    assert inst_leaf.shape[0] == total

    order = np.argsort(inst_cell, kind="stable")
    inst_leaf = inst_leaf[order]
    inst_cell = inst_cell[order]

    count = np.bincount(inst_cell, minlength=C**3).astype(np.int32)
    start = np.zeros(C**3, np.int32)
    np.cumsum(count[:-1], out=start[1:])

    soa = np.zeros((max(total, 1), 7 + data.shape[1]), np.float32)
    if total:
        soa[:, 0:3] = corner[inst_leaf]
        soa[:, 3:6] = (corner + size[:, None])[inst_leaf]
        # Home cell id rides along as a bitcast i32 (one packed slice-read).
        soa[:, 6] = inst_cell.astype(np.int32).view(np.float32)
        soa[:, 7:] = data[inst_leaf]
    smax = int(np.ceil(count.max() / runcap)) if count.max() else 1
    return {
        "soa": jnp.asarray(soa),
        "start": jnp.asarray(start),
        "count": jnp.asarray(count),
        "grid_c": C,
        "runcap": runcap,
        "smax": smax,
        "n_instances": total,
    }


def _phase1(starts, counts, o4, d4, tmin4, tmax4, grid_c, runcap, smax, maxr, win):
    """Collect one tile's runs, slab-ordered. All args are per-tile.

    o4/d4: [4, 3] the tile's corner rays (tree space). Returns
    (runs_start [maxr], runs_len [maxr], n_runs).
    """
    C = grid_c
    # Dominant axis: the one with the largest minimum |component| over the
    # corner rays (a consistent-sign axis always exists for fov < 180).
    min_abs = jnp.min(jnp.abs(d4), axis=0)  # [3]
    axis = jnp.argmax(min_abs)
    sgn = jnp.sign(jnp.sum(d4[:, axis]))  # +1 / -1, consistent by choice
    perm = jnp.stack([axis, (axis + 1) % 3, (axis + 2) % 3])
    op = o4[:, perm]  # [4, 3] permuted: axis 0 is dominant
    dp = d4[:, perm]
    # Flip so the dominant component is positive.
    op = op.at[:, 0].set(jnp.where(sgn < 0, 1.0 - op[:, 0], op[:, 0]))
    dp = dp.at[:, 0].set(jnp.abs(dp[:, 0]))
    da = jnp.maximum(dp[:, 0], 1e-9)

    # Lateral enumeration signs (ordered along the rays' travel direction).
    lat_sgn = jnp.sign(jnp.sum(dp[:, 1:], axis=0))  # [2]

    # Cell id arithmetic back in ORIGINAL axes: cell = off + v' . stride'
    strides = jnp.array([C * C, C, 1], jnp.int32)[perm]  # stride per permuted axis
    s0 = jnp.where(sgn < 0, -strides[0], strides[0])
    off0 = jnp.where(sgn < 0, strides[0] * (C - 1), 0)

    slab = jnp.arange(C, dtype=jnp.float32)
    planes = jnp.stack([slab / C, (slab + 1) / C], axis=-1)  # [C, 2]
    # t of each corner ray at each slab plane, clamped to the ray's span.
    t = (planes[:, None, :] - op[None, :, 0:1]) / da[None, :, None]  # [C, 4, 2]
    t = jnp.clip(t, tmin4[None, :, None], tmax4[None, :, None])
    lat = op[None, :, None, 1:] + t[..., None] * dp[None, :, None, 1:]  # [C,4,2,2]
    lat_lo = jnp.min(lat, axis=(1, 2))  # [C, 2]
    lat_hi = jnp.max(lat, axis=(1, 2))
    v_lo = jnp.floor(lat_lo * C).astype(jnp.int32) - 1  # pad one cell
    v_hi = jnp.floor(lat_hi * C).astype(jnp.int32) + 1

    # win x win window per slab, enumerated along the travel signs so a ray
    # crossing one lateral boundary inside a slab sees its two cells in
    # front-to-back order. `win` is sized by the caller from the tile's
    # angular footprint (C * sqrt(3) * TILE / focal + slack).
    w = jnp.arange(win, dtype=jnp.int32)
    w1 = jnp.where(lat_sgn[0] >= 0, v_lo[:, 0:1] + w[None, :], v_hi[:, 0:1] - w[None, :])
    w2 = jnp.where(lat_sgn[1] >= 0, v_lo[:, 1:2] + w[None, :], v_hi[:, 1:2] - w[None, :])
    in1 = (w1 >= 0) & (w1 < C) & (w1 >= v_lo[:, 0:1]) & (w1 <= v_hi[:, 0:1])
    in2 = (w2 >= 0) & (w2 < C) & (w2 >= v_lo[:, 1:2]) & (w2 <= v_hi[:, 1:2])
    # Home-axis voxel of this slab in original coords.
    a = jnp.arange(C, dtype=jnp.int32)
    cell = (
        off0[None, None, None]
        + a[:, None, None] * s0
        + jnp.clip(w1, 0, C - 1)[:, :, None] * strides[1]
        + jnp.clip(w2, 0, C - 1)[:, None, :] * strides[2]
    )
    valid = in1[:, :, None] & in2[:, None, :]
    cell_flat = cell.reshape(-1)
    valid_flat = valid.reshape(-1)
    cnt = jnp.where(valid_flat, counts[jnp.clip(cell_flat, 0, C**3 - 1)], 0)
    st = starts[jnp.clip(cell_flat, 0, C**3 - 1)]

    # Split long cells into <= smax runs of <= runcap rows.
    m = jnp.arange(smax, dtype=jnp.int32)
    seg_len = jnp.clip(cnt[:, None] - m[None, :] * runcap, 0, runcap)  # [N, smax]
    seg_start = st[:, None] + m[None, :] * runcap
    seg_valid = seg_len > 0

    flat_valid = seg_valid.reshape(-1)
    flat_start = seg_start.reshape(-1)
    flat_len = seg_len.reshape(-1)

    # Order-preserving compaction into maxr slots. rank is nondecreasing and
    # increments exactly at valid entries, so the FIRST index where rank == m
    # is the m-th valid entry — a searchsorted, not a one-hot matmul (which
    # would materialize a [N, maxr] intermediate per tile).
    rank = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    n_runs = jnp.minimum(rank[-1] + 1, maxr)
    slots = jnp.arange(maxr, dtype=jnp.int32)
    idx = jnp.searchsorted(rank, slots, side="left")
    idx = jnp.clip(idx, 0, rank.shape[0] - 1)
    slot_ok = slots < n_runs
    runs_start = jnp.where(slot_ok, flat_start[idx], 0)
    runs_len = jnp.where(slot_ok, flat_len[idx], 0)
    return runs_start, runs_len, n_runs


def _phase2(
    soa,
    runs_start,
    runs_len,
    o,
    invd,
    delta_scale,
    tmin,
    tmax,
    basis,
    fmt,
    basis_dim,
    runcap,
    grid_c,
    step_eps,
    stop_thresh,
):
    """Composite one tile. Per-tile args:
      runs_start/len [cap]; o/invd [256,3]; delta_scale/tmin/tmax [256];
      basis [256, B]. Returns (rgb [256, 3], light [256]).
    """
    C = grid_c
    n_channels = (soa.shape[1] - 7 - 1) // basis_dim

    def body(carry, run):
        cum_od, acc = carry
        start, length = run
        rows = jax.lax.dynamic_slice(
            soa, (start, 0), (runcap, soa.shape[1])
        )  # [runcap, 7+D]
        lo = rows[:, 0:3]
        hi = rows[:, 3:6]
        home = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        sigma = jnp.maximum(rows[:, -1], 0.0)
        lane = jnp.arange(runcap, dtype=jnp.int32)
        live = lane < length

        # Ray-box slab test: [256, runcap]
        t1 = (lo[None, :, :] - o[:, None, :]) * invd[:, None, :]
        t2 = (hi[None, :, :] - o[:, None, :]) * invd[:, None, :]
        tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        entry = jnp.maximum(tn, tmin[:, None])
        # March parity: a cell is included iff its segment STARTS within the
        # ray span; the march then integrates the full cell (no tmax clip).
        hit = (tf > entry) & (entry <= tmax[:, None]) & live[None, :]
        # Dedup replicated instances: the segment midpoint (strictly inside
        # the leaf, never on a shared face) lies in exactly one covered cell.
        mp = o[:, None, :] + (0.5 * (entry + tf))[..., None] / invd[:, None, :]
        mv = jnp.clip((mp * C).astype(jnp.int32), 0, C - 1)
        mcell = (mv[..., 0] * C + mv[..., 1]) * C + mv[..., 2]
        hit = hit & (mcell == home[None, :]) & (sigma[None, :] > 0.0)

        dt = (tf - entry + step_eps) * delta_scale[:, None]
        sdt = jnp.where(hit, sigma[None, :] * dt, 0.0)  # [256, runcap]

        # Exact in-run ordering WITHOUT a pairwise [r, l, l'] tensor: sort
        # each ray's run hits by entry t (misses to the back with t=+inf),
        # then composite with an exclusive prefix sum of optical depth.
        sort_key = jnp.where(hit, entry, jnp.inf)
        perm = jnp.argsort(sort_key, axis=1)
        sdt_s = jnp.take_along_axis(sdt, perm, axis=1)
        occ = cum_od[:, None] + jnp.cumsum(sdt_s, axis=1) - sdt_s  # exclusive

        # Colors: one MXU matmul per run, gathered into sorted order.
        coeffs = rows[:, 7:-1].reshape(runcap, n_channels, basis_dim)
        raw = jnp.einsum("lcb,rb->rlc", coeffs, basis)
        rgb = jax.nn.sigmoid(raw) if fmt in ("SH", "SG") else raw
        rgb_s = jnp.take_along_axis(rgb, perm[..., None], axis=1)

        light = jnp.exp(-occ)
        contrib = jnp.where(light > stop_thresh, light * (1.0 - jnp.exp(-sdt_s)), 0.0)
        acc = acc + jnp.einsum("rl,rlc->rc", contrib, rgb_s)
        cum_od = cum_od + jnp.sum(sdt_s, axis=-1)
        return (cum_od, acc), None

    init = (jnp.zeros(o.shape[0], jnp.float32), jnp.zeros((o.shape[0], n_channels), jnp.float32))
    (cum_od, acc), _ = jax.lax.scan(body, init, (runs_start, runs_len))
    return acc, jnp.exp(-cum_od)


class FrustumRenderer:
    """Full-image pinhole renderer over a static tree (serving/eval path)."""

    def __init__(
        self,
        tree,
        step_size=1e-4,
        background_brightness=1.0,
        sigma_thresh=0.0,
        stop_thresh=0.0,
        grid_c=32,
        runcap=64,
        maxr=192,
        bucket_caps=(16, 48, 192),
    ):
        self.tree = tree
        self.opts = RenderOptions(
            step_size=step_size,
            background_brightness=background_brightness,
            sigma_thresh=sigma_thresh,
            stop_thresh=stop_thresh,
        )
        self.index = build_leaf_index(tree, sigma_thresh, grid_c, runcap)
        self.grid_c = grid_c
        self.runcap = runcap
        self.maxr = maxr
        self.bucket_caps = tuple(bucket_caps)
        self.fmt = tree.data_format.format
        self.basis_dim = tree.data_format.basis_dim
        self.offset = jnp.asarray(tree.offset, jnp.float32)
        self.invradius = jnp.asarray(tree.invradius, jnp.float32)
        self.extra_data = (
            None if tree.extra_data is None else jnp.asarray(tree.extra_data)
        )

        self._p1_cache = {}
        self._p2 = {}

    def _get_p1(self, win, maxr):
        key = (win, maxr)
        if key not in self._p1_cache:
            self._p1_cache[key] = jax.jit(
                jax.vmap(
                    functools.partial(
                        _phase1,
                        grid_c=self.grid_c,
                        runcap=self.runcap,
                        smax=self.index["smax"],
                        maxr=maxr,
                        win=win,
                    ),
                    in_axes=(None, None, 0, 0, 0, 0),
                )
            )
        return self._p1_cache[key]

    def _get_p2(self, cap):
        if cap not in self._p2:
            self._p2[cap] = jax.jit(
                jax.vmap(
                    functools.partial(
                        _phase2,
                        fmt=self.fmt,
                        basis_dim=self.basis_dim,
                        runcap=self.runcap,
                        grid_c=self.grid_c,
                        step_eps=self.opts.step_size,
                        stop_thresh=self.opts.stop_thresh,
                    ),
                    in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0),
                )
            )
        return self._p2[cap]

    def _tile_rays(self, c2w, height, width, fx):
        """Host ray setup -> per-tile tree-space ray arrays."""
        from plenoctree_tpu.data.rays import generate_rays

        hp = -(-height // TILE) * TILE
        wp = -(-width // TILE) * TILE
        # Generate rays at the TRUE size (the principal point must stay at
        # the true image center), then edge-pad to the tile grid; padded
        # rays are rendered and cropped away.
        rays = generate_rays(width, height, fx, np.asarray(c2w, np.float32)[None])
        o = rays.origins.reshape(height, width, 3).astype(np.float32)
        d = rays.directions.reshape(height, width, 3).astype(np.float32)
        if hp != height or wp != width:
            o = np.pad(o, ((0, hp - height), (0, wp - width), (0, 0)), mode="edge")
            d = np.pad(d, ((0, hp - height), (0, wp - width), (0, 0)), mode="edge")

        def tilize(x):
            return (
                x.reshape(hp // TILE, TILE, wp // TILE, TILE, 3)
                .transpose(0, 2, 1, 3, 4)
                .reshape(-1, TILE * TILE, 3)
            )

        ot, dt = tilize(o), tilize(d)
        return ot, dt, hp, wp

    def render_persp(self, c2w, height, width, fx):
        """Render an image [H, W, 3] with this renderer's thresholds.

        Fast mode = construct the renderer with sigma_thresh/stop_thresh 1e-2
        (the leaf index is threshold-dependent, so fast is an init-time
        choice here rather than a call-time flag).
        """
        ot, dt, hp, wp = self._tile_rays(c2w, height, width, fx)
        n_tiles = ot.shape[0]

        # Tree-space transform + per-ray quantities (host->device once).
        viewdirs = dt / np.linalg.norm(dt, axis=-1, keepdims=True)
        o = jnp.asarray(ot) * self.invradius + self.offset
        d = jnp.asarray(viewdirs) * self.invradius
        delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
        dn = d * delta_scale[..., None]
        safe_dn = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
        invd = 1.0 / safe_dn
        t0 = (0.0 - o) * invd
        t1 = (1.0 - o) * invd
        tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0) + 1e-5
        tmax = jnp.min(jnp.maximum(t0, t1), -1) - 1e-5
        basis = _ray_basis(
            self.fmt,
            self.basis_dim,
            jnp.asarray(viewdirs.reshape(-1, 3)),
            self.extra_data,
        ).reshape(n_tiles, TILE * TILE, -1)

        corners = np.array(
            [0, TILE - 1, TILE * (TILE - 1), TILE * TILE - 1], np.int32
        )
        # Lateral window per slab: the tile's angular footprint in grid
        # cells at the far side of the volume, plus travel + pad slack.
        win = int(min(self.grid_c, np.ceil(np.sqrt(3) * TILE / fx * self.grid_c) + 3))
        # A saturated tile means runs were dropped — retry with more slots
        # (wide-fov / small-focal renders; serving focals stay at self.maxr).
        maxr = self.maxr
        while True:
            runs_start, runs_len, n_runs = self._get_p1(win, maxr)(
                self.index["start"],
                self.index["count"],
                o[:, corners],
                dn[:, corners],
                tmin[:, corners],
                tmax[:, corners],
            )
            n_runs_h = np.asarray(n_runs)
            if n_runs_h.max(initial=0) < maxr or maxr >= 4096:
                break
            maxr *= 2

        rgb_out = np.zeros((n_tiles, TILE * TILE, 3), np.float32)
        light_out = np.ones((n_tiles, TILE * TILE), np.float32)
        # Bucket tiles by run count (0-run tiles render as pure background).
        caps = [c for c in self.bucket_caps if c < maxr]
        caps.append(maxr)
        assigned = n_runs_h == 0
        # Bounded tile batches: caps phase-2 intermediates (~50 MB/step) for
        # big images without 30x padding waste on tiny ones; the power-of-two
        # ladder keeps the compile set small.
        P2_BATCH = int(min(256, max(8, 1 << int(np.ceil(np.log2(n_tiles))))))
        for cap in caps:
            sel = np.nonzero((~assigned) & (n_runs_h <= cap))[0]
            assigned[sel] = True
            if sel.size == 0:
                continue
            p2 = self._get_p2(cap)
            for i in range(0, sel.size, P2_BATCH):
                sb = sel[i : i + P2_BATCH]
                pad = P2_BATCH - sb.size
                sb_p = np.concatenate([sb, np.repeat(sb[:1], pad)]) if pad else sb
                sel_d = jnp.asarray(sb_p)
                acc, light = p2(
                    self.index["soa"],
                    runs_start[sel_d, :cap],
                    runs_len[sel_d, :cap],
                    o[sel_d],
                    invd[sel_d],
                    delta_scale[sel_d],
                    tmin[sel_d],
                    tmax[sel_d],
                    basis[sel_d],
                )
                acc = np.asarray(acc)
                light = np.asarray(light)
                if pad:
                    acc, light = acc[: sb.size], light[: sb.size]
                rgb_out[sb] = acc
                light_out[sb] = light

        img = rgb_out + light_out[..., None] * self.opts.background_brightness
        img = (
            img.reshape(hp // TILE, wp // TILE, TILE, TILE, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(hp, wp, 3)
        )
        return img[:height, :width]
