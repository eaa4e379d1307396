"""Pallas tile-frustum PlenOctree renderer — the TPU serving path.

Reference capability: svox's CUDA `render_persp` + the C++ volrend viewer
(reference octree/nerf/utils.py:448-498; paper headline ~150 FPS @ 800x800
on a V100). Per-ray adaptive marching is gather-latency-bound on TPU
(measured ~7-40 ns per data-dependent gather, octree/march.py), so this
renderer restructures the computation around contiguous DMA and dense
VPU/MXU math:

  * Build (host, per scene): every leaf above the sigma threshold is
    split into one CLIPPED replica per coarse C^3 grid cell it overlaps —
    an exact spatial partition, so every replica a ray hits contributes
    exactly its own sub-segment and the kernel needs no dedup (cell
    boundaries and leaf corners are exact binary floats; sub-segments
    tile with no gap or overlap). Instances are sorted in THREE axis-major
    orders (one per possible dominant ray axis), with the stride-1
    lateral-2 axis binned at a FINER resolution fine_c2 (clipped-box
    centers), so that, for any camera, every per-frame access is a
    CONTIGUOUS run of rows that phase 1 can trim tightly.
  * Phase 1 (XLA, per 16x16 pixel tile): walk the tile frustum through the
    grid slab-by-slab along the dominant axis; per (slab, lateral-1 strip)
    compute the EXACT lateral-2 extent of the frustum hull inside the
    strip (candidate min/max over all point-pair segments of the 8
    projected corner crossings) plus the axis copy's max clipped
    half-extent, giving ONE tight contiguous CSR row range, stamped with a
    4-bit quad-ray-group overlap mask (quarter-frustum p-vertex tests).
    Ranges in front-to-back slab order are window-merged, expanded into
    quantum-aligned (32-column) DMA piece descriptors, mask-refined
    against STATIC per-block row bboxes, and zero-mask pieces dropped.
    Tiny CSR/bbox gathers are the only random access per frame.
  * Phase 2 (Pallas kernel, grid over tiles): an nbuf-deep DMA ring packs
    runrows/quantum pieces per dense [fields, 128] VMEM chunk; each chunk
    is tested against the tile rays (dense VPU, FMA-form slab tests),
    decoded with [rays, basis] x [basis, rows] MXU matmuls (tanh-form
    sigmoid), and composited with MXU ones-column reductions. Rays are
    QUAD-MAJOR (4 contiguous 64-ray groups = the tile's 2x2 pixel quads);
    a group's whole compute is skipped when no piece in the chunk carries
    its mask bit. WITHIN a chunk, occlusion ordering uses the tile's mean
    ray direction: a [rows, rows] precedence mask matmul (MXU) gives
    every hit the optical depth of the hits in front of it — no per-ray
    sort. Across chunks the order is the front-to-back emission order
    with a running per-ray optical depth in VMEM scratch.

svox semantics preserved (march.py parity): sigma<=sigma_thresh leaves
contribute neither color nor attenuation; dt = (exit-entry) + step_size;
light below stop_thresh stops accumulating; remaining light composites
onto background_brightness. Known approximation vs the march oracle
(tests pin it to >40 dB): hit ordering between laterally-adjacent cells
uses mean-direction order rather than per-ray order (the ray sets that
hit both are small).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plenoctree_tpu.octree.renderer import RenderOptions, _ray_basis

TILE = 16  # pixels per tile side (256 rays)
RAYS = TILE * TILE
RUNROWS = 128  # default instance rows per DMA chunk (must be a multiple of 128)
# Bump whenever build_tile_index's output layout changes (cache invalidation
# for persisted indexes, e.g. scripts/bench_octree_render.py).
INDEX_FORMAT_VERSION = 6
# Axis copies are padded to a fixed COPY_PAD multiple so ONE index serves any
# runrows <= COPY_PAD (pieces are quantum-column DMAs that never cross a copy
# boundary; nothing in the layout depends on the kernel's chunk width).
COPY_PAD = 1024


# ---------------------------------------------------------------------------
# Build: clipped instance replication, 3 axis-major sort orders
# ---------------------------------------------------------------------------


def build_tile_index(
    tree, sigma_thresh=0.0, grid_c=64, fine_c2=None, runrows=RUNROWS,
    keep_all=False, quantum=128,
):
    """Host-side per-scene preprocessing.

    Each kept leaf is split into CLIPPED instances — one per coarse C^3
    grid cell it overlaps, with the box clipped to that cell. Clipping
    makes the instances an exact spatial partition: every replica a ray
    hits contributes exactly its own sub-segment, so the kernel needs no
    replica dedup at all (cell boundaries k/C and leaf corners j/2^d are
    exact binary floats, so adjacent sub-segments tile with no gap or
    overlap; each sub-segment gets one step epsilon — identical to one
    whole-leaf segment for the dominant span-1 case).

    Within a (C, C) dominant x lateral-1 cell, rows are sorted by their
    clipped-box CENTER binned at the finer lateral-2 resolution `fine_c2`
    (default 4*C), so phase 1 can trim each (slab, lateral-1 strip) to the
    exact frustum hull range in lateral-2 plus a small margin (max clipped
    extent, tracked per axis copy).

    Returns dict with:
      soa  [fields, 3 * npad] f32, field-major: lo(3) hi(3) +
           data(data_dim) + sublane pad — three axis-major copies side by
           side, each padded to a RUNROWS multiple
      csr  [3, C*C*c2 + 1] i32 — per-axis row starts (local to each copy)
      base [3] i32 — column offset of each copy inside soa
      margin [3] f32 — per-axis max clipped lateral-2 half-extent
      grid_c, fine_c2, n_instances, sigma_row
    """
    leaves = tree._leaf_nodes()
    corner = tree._cell_corner(leaves).astype(np.float64)
    size = tree._cell_size(leaves).astype(np.float64)
    data = tree.data[leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]].astype(
        np.float32
    )
    sigma = data[:, -1]
    if keep_all:
        # Optimizer mode: every leaf stays in the index so zero-sigma leaves
        # can revive under gradient (svox renders current data each step).
        keep = np.ones(sigma.shape, bool)
    else:
        keep = (sigma > 0.0) & (sigma > sigma_thresh)
    corner, size, data = corner[keep], size[keep], data[keep]

    C = grid_c
    c2 = fine_c2 or 4 * C
    lo_cell = np.clip((corner * C).astype(np.int64), 0, C - 1)
    hi_cell = np.clip(
        np.ceil((corner + size[:, None]) * C).astype(np.int64) - 1, 0, C - 1
    )
    span = hi_cell - lo_cell + 1

    # Expand instances over the (dx,dy,dz) offset lattice.
    max_span = int(span.max()) if span.size else 1
    inst_leaf, inst_vox = [], []
    for dx in range(max_span):
        for dy in range(max_span):
            for dz in range(max_span):
                m = (dx < span[:, 0]) & (dy < span[:, 1]) & (dz < span[:, 2])
                if not m.any():
                    continue
                idx = np.nonzero(m)[0]
                inst_leaf.append(idx)
                inst_vox.append(lo_cell[idx] + np.array([dx, dy, dz])[None, :])
    if inst_leaf:
        inst_leaf = np.concatenate(inst_leaf)
        inst_vox = np.concatenate(inst_vox, axis=0)
    else:
        inst_leaf = np.zeros(0, np.int64)
        inst_vox = np.zeros((0, 3), np.int64)
    n = inst_leaf.shape[0]

    # Clip each instance's box to its cell (float64 host math; the clip
    # planes are exact in f32 for power-of-two C).
    box_lo = np.maximum(corner[inst_leaf], inst_vox / C)
    box_hi = np.minimum(
        (corner + size[:, None])[inst_leaf], (inst_vox + 1) / C
    )
    d_cols = data.shape[1]
    rows = np.zeros((n, 6 + d_cols), np.float32)
    rows[:, 0:3] = box_lo
    rows[:, 3:6] = box_hi
    rows[:, 6:] = data[inst_leaf]

    # BLOCKED field-major layout [3*npad/quantum, fields, quantum]: each
    # quantum-column piece is one CONTIGUOUS fields x quantum tile in HBM,
    # so a piece DMA is a single dense burst instead of `fields` separate
    # 4*quantum-byte lines strided by the whole table width (the 2D layout's
    # strided fetch was measured DMA-issue-bound at bench scale). The lane
    # dim (quantum) is 128-aligned as Mosaic requires, and coefficient rows
    # still reach the MXU with no transpose. Each axis-major copy is padded
    # to a COPY_PAD multiple (a multiple of every supported quantum and
    # runrows), so the SAME index serves any kernel chunking — runrows/
    # nbuf/tile scans never rebuild the index.
    del runrows  # layout is chunking-independent (see COPY_PAD)
    npad = max(-(-n // COPY_PAD) * COPY_PAD, COPY_PAD)
    if 3 * npad >= 2**24:
        # Phase 1 moves row ids through one-hot f32 matmuls, which are
        # integer-exact only below 2^24. A tree this size also implies a
        # >3.7 GB soa; shard the scene before serving it.
        raise ValueError(
            f"tile index too large: 3*npad = {3*npad} >= 2^24 rows; phase-1 "
            "one-hot matmul compaction would lose integer exactness."
        )
    fpad = -(-(6 + d_cols) // 8) * 8  # field rows padded to the sublane tile
    soa = np.zeros((fpad, 3 * npad), np.float32)
    csr = np.zeros((3, C * C * c2 + 1), np.int64)
    base = np.array([0, npad, 2 * npad], np.int64)
    margin = np.zeros(3, np.float32)
    n_kept = int(keep.sum())
    col_leaf = np.full(3 * npad, n_kept, np.int32)  # fill = dummy row
    ctr = 0.5 * (box_lo + box_hi)
    ext = box_hi - box_lo
    # Static per-quantum-block bboxes over each copy's sorted rows: phase 1
    # intersects them with the quad frusta for per-PIECE group masks (far
    # tighter than the range-level mask) and drops no-overlap pieces.
    nblk = npad // quantum
    blk_bbox = np.zeros((3 * nblk, 8), np.float32)
    blk_bbox[:, 0:3] = np.inf
    blk_bbox[:, 3:6] = -np.inf
    for axis in range(3):
        p = (axis, (axis + 1) % 3, (axis + 2) % 3)
        v2 = np.clip((ctr[:, p[2]] * c2).astype(np.int64), 0, c2 - 1)
        key = (inst_vox[:, p[0]] * C + inst_vox[:, p[1]]) * c2 + v2
        order = np.argsort(key, kind="stable")
        soa[: 6 + d_cols, axis * npad : axis * npad + n] = rows[order].T
        col_leaf[axis * npad : axis * npad + n] = inst_leaf[order]
        count = np.bincount(key, minlength=C * C * c2)
        csr[axis, 1:] = np.cumsum(count)
        margin[axis] = 0.5 * float(ext[:, p[2]].max()) if n else 0.0
        lo_s = np.full((npad, 3), np.inf, np.float32)
        hi_s = np.full((npad, 3), -np.inf, np.float32)
        lo_s[:n] = rows[order][:, 0:3]
        hi_s[:n] = rows[order][:, 3:6]
        blk_bbox[axis * nblk : (axis + 1) * nblk, 0:3] = lo_s.reshape(
            nblk, quantum, 3
        ).min(axis=1)
        blk_bbox[axis * nblk : (axis + 1) * nblk, 3:6] = hi_s.reshape(
            nblk, quantum, 3
        ).max(axis=1)
    # Host assembly stays row-major (cheap column writes); ship the blocked
    # [n_blocks, fields, quantum] view to the device.
    soa3 = np.ascontiguousarray(
        soa.reshape(fpad, 3 * npad // quantum, quantum).transpose(1, 0, 2)
    )
    return {
        "col_leaf": col_leaf,
        "n_kept": n_kept,
        "keep_mask": keep,
        "blk_bbox": jnp.asarray(blk_bbox),
        "blk_quantum": quantum,
        "soa": jnp.asarray(soa3),
        "csr": jnp.asarray(csr.astype(np.int32)),
        "base": jnp.asarray(base.astype(np.int32)),
        "margin": jnp.asarray(margin),
        "grid_c": C,
        "fine_c2": c2,
        "n_instances": n,
        "sigma_row": 6 + d_cols - 1,
    }


# ---------------------------------------------------------------------------
# Phase 1: per-tile frustum walk -> compacted contiguous row ranges
# ---------------------------------------------------------------------------


_SEG_II, _SEG_JJ = np.triu_indices(8, k=1)  # all 28 point pairs


def _tilize(x, hp, wp, tile):
    """[hp, wp, c] -> [T, RAYS, c] in QUAD-MAJOR ray order: each tile's
    rays are 4 contiguous (tile/2)^2 blocks (its 2x2 pixel quads), so the
    kernel's per-quad-group compute slices contiguous sublane ranges."""
    q = tile // 2
    c = x.shape[-1]
    return (
        x.reshape(hp // tile, 2, q, wp // tile, 2, q, c)
        .transpose(0, 3, 1, 4, 2, 5, 6)
        .reshape(-1, tile * tile, c)
    )


def _untile(tiles, hp, wp, tile):
    """Inverse of _tilize for kernel outputs [T, RAYS, c] -> [hp, wp, c]."""
    q = tile // 2
    c = tiles.shape[-1]
    return (
        tiles.reshape(hp // tile, wp // tile, 2, 2, q, q, c)
        .transpose(0, 2, 4, 1, 3, 5, 6)
        .reshape(hp, wp, c)
    )


def _tile_corner_idx(tile):
    """Ray indices of the tile's 4 corner pixels in quad-major order."""
    q = tile // 2
    return np.array(
        [0, q * q + q - 1, 2 * q * q + (q - 1) * q, tile * tile - 1], np.int32
    )


_GROUP_CORNER_OFF = lambda q: np.array(  # noqa: E731
    [0, q - 1, (q - 1) * q, q * q - 1], np.int32
)


def _phase1(
    csr, base, margin, blk_bbox, o4, d4, gplanes, goff, span_lo, span_hi,
    any_hit, grid_c, fine_c2, w1cap, quantum, ccap,
):
    """One tile's candidate row ranges, front-to-back slab order.

    o4/d4 [4, 3]: the tile's corner rays (tree space, unit dn).
    gplanes [16, 3] / goff [16]: per-group half-space tests — a box is
    "possibly hit by group g" iff max over the box of n·x >= goff for all
    4 of the group's planes (rows g*4..g*4+3). Pinhole tiles pass the 4
    quad-group frustum normals with goff = n·apex; NDC tiles pass axis
    normals (±x, ±y) with goff from the group's ray-segment-endpoint
    AABB (rays there share no apex, but their [tmin, tmax] segments are
    straight in tree space, so the endpoint AABB bounds every segment).
    Used to stamp every range with a 4-bit group-overlap mask so the
    kernel can skip quad-ray-groups per chunk.
    span_lo/span_hi: conservative t-span over the tile's FULL ray set;
    any_hit: whether any tile ray intersects the volume at all (exact
    gate — off-box tiles emit zero ranges). Returns (piece_c0, piece_lo,
    piece_hi, piece_mask [ccap each], n_pieces, n_total, w1_over) where
    w1_over counts lateral-1 cells beyond the static window (0 = fully
    covered; >0 would silently drop geometry, so the driver regrows w1cap
    and re-renders — ADVICE r2: the sqrt(3) chord bound undersizes the
    window for cameras far outside the volume).

    List surgery here is deliberately searchsorted/gather-free: run lists
    stay on the FLAT [C * w1cap] (slab, strip) lattice (so there is no
    run-count cap and nothing ever truncates), holes are bridged with
    carry-forward scans, compactions are stable sorts, and run->piece
    expansion is an exact one-hot matmul. vmapped jnp.searchsorted +
    gather compaction measured ~78 ms per stage at the 800^2 bench scale
    (the round-3 five-stage pipeline cost 848 ms/frame); the scan/sort
    formulation is ~100x cheaper on TPU.
    """
    C = grid_c
    min_abs = jnp.min(jnp.abs(d4), axis=0)
    axis = jnp.argmax(min_abs)
    perm = jnp.stack([axis, (axis + 1) % 3, (axis + 2) % 3])
    op = o4[:, perm]  # [4, 3]; component 0 = dominant
    dp = d4[:, perm]
    sgn = jnp.sign(jnp.sum(dp[:, 0]))
    safe_d = jnp.where(jnp.abs(dp) < 1e-9, 1e-9, dp)

    # Slab planes along the dominant axis, enumerated in travel order.
    s = jnp.arange(C, dtype=jnp.float32)
    a_pos = jnp.where(sgn >= 0, s, C - 1.0 - s).astype(jnp.int32)  # [C]
    plane_lo = a_pos.astype(jnp.float32) / C
    plane_hi = (a_pos.astype(jnp.float32) + 1.0) / C
    # Corner-ray t at both planes, UNCLIPPED: for a shared-origin tile the
    # frustum cross-section at a plane is exactly the hull of the corner
    # crossings, so clipping a corner to its own box span (which may be
    # empty at wide FOV) would under-cover the interior rays.
    ta = (plane_lo[:, None] - op[None, :, 0]) / safe_d[None, :, 0]  # [C, 4]
    tb = (plane_hi[:, None] - op[None, :, 0]) / safe_d[None, :, 0]
    t_in = jnp.minimum(ta, tb)
    t_out = jnp.maximum(ta, tb)
    # Slab pruning via the tile's conservative t-span (over ALL rays).
    # Guard scales with |t|: TPU f32 division/rsqrt are approximate
    # (~1e-6 relative), so edge rays carry up to ~1e-2 absolute t error
    # vs the IEEE-exact CPU path — measured cross-backend aux diffs of
    # 1.5e-2 flipped slab pruning non-conservatively before this guard.
    tguard = 2e-2 * (1.0 + jnp.maximum(jnp.abs(span_lo), jnp.abs(span_hi)))
    slab_valid = (
        jnp.any((t_in <= span_hi + tguard) & (t_out >= span_lo - tguard), axis=1)
        & any_hit
    )  # [C]

    # Lateral footprint: corner positions at both plane crossings. The 8
    # projected points' convex hull covers every tile ray's path through
    # the slab (interior crossings are convex combinations of corner
    # crossings at each plane); rows are cell-replicated in lateral-1 so
    # only lateral-2 (center-binned at fine_c2) needs the margin.
    ts = jnp.stack([t_in, t_out], axis=-1)  # [C, 4, 2]
    lat = op[None, :, None, 1:] + ts[..., None] * dp[None, :, None, 1:]  # [C,4,2,2]
    lat = jnp.clip(lat, -1.0, 2.0)  # keep the i32 cell math in range
    pts = lat.reshape(C, 8, 2)
    lat_lo = jnp.min(pts, axis=1)  # [C, 2]
    lat_hi = jnp.max(pts, axis=1)
    # Bin epsilons sized for TPU float noise: crossing positions carry
    # ~1e-5 coordinate error (approximate divide, |d|*t*releps), which is
    # ~1e-3 in bin units at C=64..256 — 1e-2 dominates it with slack.
    v_lo = jnp.floor(lat_lo[:, 0] * C - 1e-2).astype(jnp.int32)
    v_hi = jnp.floor(lat_hi[:, 0] * C + 1e-2).astype(jnp.int32)
    v_lo = jnp.clip(v_lo, 0, C - 1)
    v_hi = jnp.clip(v_hi, 0, C - 1)

    # lateral-1 window, enumerated along travel sign.
    sgn1 = jnp.sign(jnp.sum(dp[:, 1]))
    j = jnp.arange(w1cap, dtype=jnp.int32)
    w1 = jnp.where(sgn1 >= 0, v_lo[:, None] + j[None, :], v_hi[:, None] - j[None, :])
    w1_ok = (j[None, :] <= (v_hi[:, None] - v_lo[:, None])) & slab_valid[:, None]
    w1c = jnp.clip(w1, 0, C - 1)
    w1_over = jnp.max(jnp.where(slab_valid, v_hi - v_lo + 1 - w1cap, 0))

    # Exact lateral-2 range of (hull of the 8 points) ∩ (lateral-1 strip
    # [w1/C, (w1+1)/C]): extremes lie at hull vertices inside the strip or
    # at hull-edge/strip-bound crossings; evaluating ALL 28 point-pair
    # segments is a superset of the hull edges whose interior segments
    # never extend past the hull — so min/max over the candidate set is
    # exact. Then pad by the axis copy's max clipped half-extent (rows are
    # center-binned at fine_c2).
    c2 = fine_c2
    lo1 = w1c.astype(jnp.float32) / C  # [C, w1cap]
    hi1 = (w1c.astype(jnp.float32) + 1.0) / C
    ep1 = pts[:, None, :, 0]  # [C, 1, 8]
    ep2 = pts[:, None, :, 1]
    ep_in = (ep1 >= lo1[..., None] - 5e-5) & (
        ep1 <= hi1[..., None] + 5e-5
    )  # [C, w1cap, 8] (strip padded by the float-noise bound)
    p1 = pts[:, _SEG_II, 0][:, None, :]  # [C, 1, 28]
    q1 = pts[:, _SEG_JJ, 0][:, None, :]
    p2 = pts[:, _SEG_II, 1][:, None, :]
    q2 = pts[:, _SEG_JJ, 1][:, None, :]
    den = q1 - p1
    nz = jnp.abs(den) > 1e-12
    safe_den = jnp.where(nz, den, 1.0)
    big = jnp.float32(1e9)

    def cross_l2(bound):
        t = (bound[..., None] - p1) / safe_den
        # Widened parameter window: a crossing at a segment endpoint must
        # not drop out under approximate-division jitter (conservative —
        # extra candidates only widen the trim).
        ok = nz & (t >= -1e-4) & (t <= 1.0 + 1e-4)
        return ok, p2 + t * (q2 - p2)

    ok_a, x_a = cross_l2(lo1)
    ok_b, x_b = cross_l2(hi1)
    # Per-candidate-set min/max, folded pairwise — materializing the
    # concatenated [C, w1cap, 64] candidate tensors (ok, l2, and the two
    # where-products) dominated phase-1 device time at the 800^2 scale.
    ep2b = ep2 * jnp.ones_like(ep_in, jnp.float32)
    l2_min = jnp.minimum(
        jnp.min(jnp.where(ep_in, ep2b, big), axis=-1),
        jnp.minimum(
            jnp.min(jnp.where(ok_a, x_a, big), axis=-1),
            jnp.min(jnp.where(ok_b, x_b, big), axis=-1),
        ),
    )
    l2_max = jnp.maximum(
        jnp.max(jnp.where(ep_in, ep2b, -big), axis=-1),
        jnp.maximum(
            jnp.max(jnp.where(ok_a, x_a, -big), axis=-1),
            jnp.max(jnp.where(ok_b, x_b, -big), axis=-1),
        ),
    )
    has = jnp.any(ep_in, axis=-1) | jnp.any(ok_a, axis=-1) | jnp.any(ok_b, axis=-1)
    w1_ok = w1_ok & has
    mh = margin[axis] + 5e-5
    v2_lo = jnp.clip(
        jnp.floor((l2_min - mh) * c2 - 2e-2).astype(jnp.int32), 0, c2 - 1
    )
    v2_hi = jnp.clip(
        jnp.floor((l2_max + mh) * c2 + 2e-2).astype(jnp.int32), 0, c2 - 1
    )

    cell_lo = (a_pos[:, None] * C + w1c) * c2 + v2_lo  # [C, w1cap]
    cell_hi = (a_pos[:, None] * C + w1c) * c2 + v2_hi
    r_start = csr[axis, cell_lo] + base[axis]
    r_end = csr[axis, cell_hi + 1] + base[axis]
    r_len = jnp.where(w1_ok, r_end - r_start, 0)

    # 4-bit quad-group mask per range: p-vertex test of the range's cell
    # box (permuted coords -> xyz via one-hot unpermute) against each quad
    # frustum's 4 inward planes through the shared apex. Conservative:
    # a cleared bit proves no ray of that 64-ray group can hit rows of
    # this range, so the kernel skips that group's compute for the chunk.
    # lat2 bounds: selected instances have center-bin in [v2_lo, v2_hi]
    # and half-extent <= mh, so their boxes lie in [v2_lo/c2 - mh,
    # (v2_hi+1)/c2 + mh]. lat1/dominant are exact (cell-clipped replicas).
    box_lo_p = jnp.stack(
        [
            jnp.broadcast_to(plane_lo[:, None], w1c.shape),
            w1c.astype(jnp.float32) / C,
            v2_lo.astype(jnp.float32) / c2 - mh,
        ],
        axis=-1,
    )  # [C, w1cap, 3] in (dominant, lat1, lat2) order
    box_hi_p = jnp.stack(
        [
            jnp.broadcast_to(plane_hi[:, None], w1c.shape),
            (w1c.astype(jnp.float32) + 1.0) / C,
            (v2_hi.astype(jnp.float32) + 1.0) / c2 + mh,
        ],
        axis=-1,
    )
    # p-vertex signed distance, collapsed to two [C*w1cap,3]@[3,16] matmuls:
    # sd = Σ_x (hi·max(nrm,0) + lo·min(nrm,0)) − goff (per-plane sign
    # select distributes over the sum), with the unpermute folded into the
    # plane-normal factors — the explicit [C, w1cap, 4, 4, 3] select tensor
    # this replaces dominated phase-1 device time.
    # precision="highest": DEFAULT would truncate the box coordinates to
    # bf16 on the MXU (~4e-3 error), overwhelming the 3e-4 mask-test slack
    # below and clearing quad-mask bits for boxes real rays hit.
    nrm16 = gplanes  # [16, 3]
    # Permuted-coordinate normals via exact gather (unperm is a permutation
    # matrix, so A @ unperm == A[:, perm] — no matmul rounding).
    pos_p = jnp.maximum(nrm16, 0.0)[:, perm]  # [16, 3] in permuted coords
    neg_p = jnp.minimum(nrm16, 0.0)[:, perm]
    sd = (
        jnp.einsum("cwp,gp->cwg", box_hi_p, pos_p, precision="highest")
        + jnp.einsum("cwp,gp->cwg", box_lo_p, neg_p, precision="highest")
        - goff[None, None, :]
    )  # [C, w1cap, 16]
    gmask = jnp.all(sd.reshape(C, w1cap, 4, 4) >= -3e-4, axis=-1)  # [C, w1cap, 4]
    r_mask = jnp.sum(
        gmask.astype(jnp.int32) * (2 ** jnp.arange(4))[None, None, :], axis=-1
    )

    flat_start = r_start.reshape(-1)
    flat_len = r_len.reshape(-1)
    flat_mask = r_mask.reshape(-1)
    n_total = jnp.sum((flat_len > 0).astype(jnp.int32))

    rev = (jnp.sign(jnp.sum(dp[:, 2])) < 0).astype(jnp.int32)
    runs_start, runs_len, runs_mask, n_merged = _merge_runs(
        flat_start, flat_len, flat_mask, rev, quantum
    )
    piece_c0, piece_lo, piece_hi, piece_mask, n_pieces = _expand_pieces(
        runs_start, runs_len, runs_mask, rev, quantum, ccap
    )

    # Per-piece mask refinement against the STATIC quantum-block bboxes
    # (exact min/max over the block's member rows, build-time): intersect
    # with the inherited range-level mask, then compact zero-mask pieces
    # away — their DMA and chunk slots vanish. Saturation detection stays
    # on the PRE-drop piece count.
    pvalid = jnp.arange(ccap, dtype=jnp.int32) < jnp.minimum(n_pieces, ccap)
    bb = blk_bbox[piece_c0 // quantum]  # [ccap, 8]
    # Same sign-select collapse as the range-level mask above: two
    # [ccap,3]@[3,16] matmuls instead of a [ccap, 4, 4, 3] select tensor.
    # bboxes are already in xyz, so no permutation fold here.
    sdist = (
        jax.lax.dot(bb[:, 3:6], jnp.maximum(nrm16, 0.0).T, precision="highest")
        + jax.lax.dot(bb[:, 0:3], jnp.minimum(nrm16, 0.0).T, precision="highest")
        - goff[None, :]
    )  # [ccap, 16]
    bmask_bits = jnp.all(sdist.reshape(-1, 4, 4) >= -3e-4, axis=-1)  # [ccap, 4]
    bmask = jnp.sum(
        bmask_bits.astype(jnp.int32) * (2 ** jnp.arange(4))[None, :], axis=-1
    )
    mask2 = jnp.where(pvalid, piece_mask & bmask, 0)
    keep_p = mask2 > 0
    n_kept_p = jnp.sum(keep_p.astype(jnp.int32))
    piece_c0, piece_lo, piece_hi, piece_mask = _compact_by_flag(
        keep_p, (piece_c0, piece_lo, piece_hi, mask2)
    )
    # meta's piece count becomes the post-drop count; the pre-drop count
    # keeps driving ccap regrowth (conservative).
    return (
        piece_c0,
        piece_lo,
        piece_hi,
        piece_mask,
        n_kept_p,
        jnp.minimum(n_total, jnp.int32(2**30)),
        w1_over,
        n_pieces,
    )


def _compact_by_flag(flag, cols):
    """Stable front-compaction: entries with flag move to the array front
    in order; the tail is zero. One batched lax.sort (log^2 compare-
    exchange passes) — no searchsorted, no gathers."""
    key = jnp.where(flag, 0, 1).astype(jnp.int32)
    masked = tuple(jnp.where(flag, c, 0) for c in cols)
    out = jax.lax.sort((key,) + masked, dimension=-1, is_stable=True, num_keys=1)
    return out[1:]


def _carry_forward(valid, vals):
    """Inclusive last-valid-value scan: out_i[m] = vals_i[k] for the
    largest k <= m with valid[k] (vals_i[m] itself where no such k).
    Also returns the seen-any-valid flag."""

    def op(a, b):
        a_ok = a[0]
        b_ok = b[0]
        out = tuple(jnp.where(b_ok, bv, av) for av, bv in zip(a[1:], b[1:]))
        return (a_ok | b_ok,) + out

    res = jax.lax.associative_scan(op, (valid,) + tuple(vals))
    return res[0], res[1:]


def _expand_pieces(runs_start, runs_len, runs_mask, rev, quantum, ccap):
    """Flatten merged runs into quantum-aligned DMA piece descriptors.

    Moving the window walk out of the kernel lets phase 2 run a deep
    ring-buffer DMA pipeline over a flat list (no per-iteration scalar
    next-run bookkeeping). Pieces are `quantum`-column blocks (quantum <=
    runrows, 128-aligned on hardware). Each descriptor is (c0: aligned
    column block start, lo/hi: the owning run's row interval; live rows =
    block ∩ [lo, hi)).

    Input runs live on the flat [M] lattice (invalid slots have len 0,
    holes allowed). The run->piece placement is an exact one-hot matmul:
    piece slot p belongs to run m iff cum_excl[m] <= p < cum[m] (the
    cumulative-piece intervals partition [0, n_pieces)), so a [ccap, M]
    0/1 matrix times the run-payload columns reproduces the gather —
    integer-exact in f32 below 2^24 (asserted at build time) and ~100x
    cheaper than vmapped searchsorted+gather on TPU."""
    s = runs_start
    l = runs_len
    first = (s // quantum) * quantum
    last = ((s + jnp.maximum(l, 1) - 1) // quantum) * quantum
    nck = jnp.where(l > 0, (last - first) // quantum + 1, 0)
    cum = jnp.cumsum(nck)
    cum_excl = cum - nck
    n_pieces = cum[-1]
    p = jnp.arange(ccap, dtype=jnp.int32)
    oh = (
        (cum_excl[None, :] <= p[:, None]) & (p[:, None] < cum[None, :])
    ).astype(jnp.float32)  # [ccap, M], exactly one-hot for p < n_pieces
    cols = jnp.stack(
        [s, s + l, runs_mask, first, last, cum_excl], axis=1
    ).astype(jnp.float32)  # [M, 6]
    # HIGHEST keeps the integer payloads exact (0/1 matrix x <2^24 ints).
    sel = jnp.einsum("pm,mc->pc", oh, cols, precision="highest").astype(jnp.int32)
    w = p - sel[:, 5]
    c0 = jnp.where(rev == 1, sel[:, 4] - w * quantum, sel[:, 3] + w * quantum)
    ok = p < jnp.minimum(n_pieces, ccap)
    piece_c0 = jnp.where(ok, c0, 0)
    piece_lo = jnp.where(ok, sel[:, 0], 0)
    piece_hi = jnp.where(ok, sel[:, 1], 0)
    piece_mask = jnp.where(ok, sel[:, 2], 0)
    return (
        piece_c0,
        piece_lo,
        piece_hi,
        piece_mask,
        jnp.minimum(n_pieces, jnp.int32(2**30)),
    )


def _merge_runs(runs_start, runs_len, runs_mask, rev, quantum):
    """Fuse emission-consecutive runs whose padded DMA windows overlap/abut.

    Ranges average well under a DMA window (measured ~1.7x column quant
    waste), so adjacent (slab, strip) emissions often share their boundary
    window — fusing them removes the duplicated fetch AND lets the
    precedence matmul order their shared-window rows geometrically. A
    merged run spans [min start, max end); the gap rows between the
    originals are rows of hull-excluded cells (phase 1's trim is exact up
    to the center-bin margin), so no tile ray hits them and compositing
    them in place is a no-op. Merging is restricted to runs consistent
    with the travel direction (start nondecreasing for rev=0, nonincreasing
    for rev=1) so the merged chunk walk preserves front-to-back order;
    ranges are disjoint row intervals, so direction-consistent chains are
    sorted and the pairwise window test equals the chain test.

    Operates on the FLAT emission lattice: invalid slots (len 0) may be
    interleaved anywhere; chains bridge the holes via a carry-forward scan
    of the previous VALID run. Group aggregation is scan/sort-only — a
    chain's extreme start/end are its FIRST and LAST members, flagged
    locally and front-compacted with one stable sort; the mask OR is a
    windowed difference of per-bit prefix sums (no searchsorted, no
    gathers — both serialize badly on TPU under the per-tile vmap)."""
    s = runs_start
    e = runs_start + runs_len
    M = s.shape[0]
    valid = runs_len > 0
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1

    def align(v):
        return (v // quantum) * quantum

    # Previous VALID run's start/end (exclusive carry-forward).
    _, (cf_s, cf_e) = _carry_forward(valid, (s, e))
    ps = jnp.concatenate([s[:1], cf_s[:-1]])
    pe = jnp.concatenate([e[:1], cf_e[:-1]])
    dir_ok = jnp.where(rev == 1, s <= ps, s >= ps)
    # rev=0: chain ascends (cur starts above prev's end) — merge when cur's
    # first window reaches prev's last. rev=1: chain descends (cur ends
    # below prev's start) — merge when prev's first consumed (lowest)
    # window reaches cur's highest.
    win_ok = jnp.where(
        rev == 1,
        align(ps) <= align(e - 1) + quantum,
        align(s) <= align(pe - 1) + quantum,
    )
    merge_prev = valid & dir_ok & win_ok & (rank > 0)
    is_first = valid & ~merge_prev
    # is_last: the next VALID run starts a new chain (or there is none).
    # Reverse carry-forward of merge_prev over valid slots gives, at each
    # m, merge_prev of the SMALLEST valid index >= m; shift left by one to
    # make it exclusive (the next valid index > m).
    nok_r, (nmp_r,) = _carry_forward(
        valid[::-1], (merge_prev.astype(jnp.int32)[::-1],)
    )
    nxt_ok = jnp.concatenate([nok_r[::-1][1:], jnp.zeros(1, bool)])
    nxt_mp = jnp.concatenate([nmp_r[::-1][1:], jnp.zeros(1, jnp.int32)])
    is_last = valid & (~nxt_ok | (nxt_mp == 0))
    n_merged = jnp.sum(is_first.astype(jnp.int32))

    # Per-bit inclusive prefix sums for the chain mask OR.
    bit = [(jnp.where(valid, runs_mask, 0) >> b) & 1 for b in range(4)]
    csum = [jnp.cumsum(b_) for b_ in bit]
    # k-th is_first and k-th is_last flag the SAME chain (chains are
    # consecutive in emission order), so two front-compactions line up.
    f_cols = _compact_by_flag(
        is_first, (s, e) + tuple(c - b_ for c, b_ in zip(csum, bit))
    )
    l_cols = _compact_by_flag(is_last, (s, e) + tuple(csum))
    new_s = jnp.where(rev == 1, l_cols[0], f_cols[0])
    new_e = jnp.where(rev == 1, f_cols[1], l_cols[1])
    new_mask = jnp.zeros(M, jnp.int32)
    for b in range(4):
        new_mask = new_mask + ((l_cols[2 + b] - f_cols[2 + b]) > 0) * (2**b)
    gvalid = jnp.arange(M, dtype=jnp.int32) < n_merged
    new_s = jnp.where(gvalid, new_s, 0)
    new_len = jnp.where(gvalid, new_e - new_s, 0)
    new_mask = jnp.where(gvalid, new_mask, 0)
    return new_s, new_len, new_mask, n_merged


# ---------------------------------------------------------------------------
# Phase 2: Pallas tile-compositing kernel
# ---------------------------------------------------------------------------


def _tile_kernel(
    # per-tile SMEM scalars / lists (dummy middle dim: Mosaic requires the
    # last two block dims to be 8/128-divisible OR equal the array dims)
    meta_ref,  # (1, 1, 4) i32: [n_pieces, 0, 0, 0]
    piece_c0_ref,  # (1, 1, ccap) i32 — quantum-aligned column block starts
    piece_lo_ref,  # (1, 1, ccap) i32 — owning run's row interval
    piece_hi_ref,  # (1, 1, ccap) i32
    piece_mask_ref,  # (1, 1, ccap) i32 — 4-bit quad-group overlap mask
    # per-tile VMEM ray blocks, ray-major [RAYS, c] (QUAD-MAJOR ray order:
    # rays g*RAYS/4..(g+1)*RAYS/4 are the g-th (tile/2)^2-pixel quad)
    o_ref,  # (1, RAYS, 4): origin xyz + pad
    invd_ref,  # (1, RAYS, 4)
    aux_ref,  # (1, RAYS, 4): delta_scale, tmin, tmax, pad
    mdir_ref,  # (1, 1, 4): mean ray dir + pad
    basis_ref,  # (1, RAYS, basis_dim)
    soa_ref,  # blocked soa [3*npad/quantum, fields, quantum], ANY/HBM
    out_ref,  # (1, RAYS, 8): rgb(nc) + light + pad
    buf,  # VMEM (NBUF, fields, runrows)
    state,  # VMEM (RAYS, 8): [cum, acc(nc), pad] — scratch, zeroed per tile
    sem,  # DMA((NBUF, G))
    *,
    fmt,
    basis_dim,
    n_channels,
    sigma_row,
    rays,
    runrows,
    quantum,
    step_eps,
    stop_thresh,
    od_cap,
    use_bf16,
    nbuf,
    ablate="",
):
    n_pieces = meta_ref[0, 0, 0]
    G = runrows // quantum  # pieces packed per dense compute chunk
    n_chunks = (n_pieces + G - 1) // G
    basis = basis_ref[0]  # [RAYS, bd]
    dscale = aux_ref[0, :, 0:1]  # [RAYS, 1]
    tmin = aux_ref[0, :, 1:2]
    tmax = aux_ref[0, :, 2:3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, runrows), 1)
    sublane = lane % quantum  # offset within each packed piece

    def piece_dma(p, slot, g):
        # Blocked soa [n_blocks, fields, quantum]: one contiguous burst.
        blk = piece_c0_ref[0, 0, p] // quantum
        return pltpu.make_async_copy(
            soa_ref.at[blk],
            buf.at[slot, :, pl.ds(g * quantum, quantum)],
            sem.at[slot, g],
        )

    def chunk_start(t, slot):
        """Start the up-to-G piece copies that fill chunk t's buffer."""
        for g in range(G):

            @pl.when(t * G + g < n_pieces)
            def _(g=g):
                piece_dma(t * G + g, slot, g).start()

    def chunk_wait(t, slot):
        for g in range(G):

            @pl.when(t * G + g < n_pieces)
            def _(g=g):
                piece_dma(t * G + g, slot, g).wait()

    # Zero the ring buffers once per tile: a PARTIAL last chunk leaves some
    # piece columns unwritten, and uninitialized VMEM could be NaN — which
    # would poison acc through 0 * NaN in the masked compositing products.
    # Stale-but-finite leftovers are harmless (hit/live masks zero them).
    buf[...] = jnp.zeros(buf.shape, jnp.float32)

    # Ring-buffer pipeline, nbuf-1 chunks in flight: per-chunk compute is
    # far smaller than the HBM copy latency, so a 2-deep double buffer left
    # the kernel latency-bound; deeper prefetch keeps the DMA engine busy.
    for p in range(nbuf - 1):

        @pl.when(p < n_chunks)
        def _(p=p):
            chunk_start(p, p)

    # Hoisted per-tile constants: o*invd puts the slab test in FMA form
    # (t = box*invd - oi), and the ones column turns [RAYS, R] -> [RAYS, 1]
    # lane reductions into MXU matmuls (cross-lane VPU reduces are
    # multi-pass; the MXU pipe is otherwise idle between the two big dots).
    oi = o_ref[0, :, :] * invd_ref[0, :, :]  # [RAYS, 4]
    ones_col = jnp.ones((runrows, 1), jnp.float32)
    # Loop-invariant [R, R] iotas for the precedence build (Mosaic does not
    # hoist vector code out of while bodies).
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 1)
    ).astype(jnp.float32)
    rid = jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 1)
    rid_lt_cid = rid < cid

    def lane_meta(t):
        """Per-lane rowid/live from the chunk's G piece descriptors."""
        rowid = jnp.zeros((1, runrows), jnp.int32)
        lo_v = jnp.zeros((1, runrows), jnp.int32)
        hi_v = jnp.zeros((1, runrows), jnp.int32)
        for g in range(G):
            in_g = (lane >= g * quantum) & (lane < (g + 1) * quantum)
            p = jnp.minimum(t * G + g, n_pieces - 1)
            rowid = jnp.where(in_g, piece_c0_ref[0, 0, p] + sublane, rowid)
            valid_p = t * G + g < n_pieces
            lo_v = jnp.where(
                in_g & valid_p, piece_lo_ref[0, 0, p], lo_v
            )
            hi_v = jnp.where(
                in_g & valid_p, piece_hi_ref[0, 0, p], hi_v
            )
        return rowid, lo_v, hi_v

    # Per-tile state lives in VMEM scratch (not the loop carry) so the
    # per-quad-group compute can update only its 64-ray slice under
    # pl.when. Scratch persists across grid steps — zero it every tile.
    state[...] = jnp.zeros(state.shape, jnp.float32)
    gsz = rays // 4
    mm_dt = jnp.bfloat16 if use_bf16 else jnp.float32
    # Loop-invariant: the decode matmul's ray-side operand never changes.
    basis_mm_all = basis.astype(mm_dt)
    ones_mm = ones_col.astype(mm_dt)

    def cond(carry):
        t, n_started = carry
        return t < n_started

    def body(carry):
        t, n_started = carry
        # Early tile exit once every ray is saturated: stop starting new
        # DMAs; the loop drains the <= nbuf-1 already in flight.
        saturated = jnp.min(state[:, 0]) > od_cap
        do_start = (n_started < n_chunks) & ~saturated

        @pl.when(do_start)
        def _():
            chunk_start(n_started, n_started % nbuf)

        n_started2 = jnp.where(do_start, n_started + 1, n_started)
        chunk_wait(t, t % nbuf)
        f = buf[t % nbuf]  # [fields, runrows]
        rowid, lo_v, hi_v = lane_meta(t)
        live = (rowid >= lo_v) & (rowid < hi_v)

        # OR of the chunk's piece masks: bit g set => quad-group g may hit
        # some row of SOME piece (conservative frustum/box test, phase 1).
        cmask = jnp.int32(0)
        for g in range(G):
            p = jnp.minimum(t * G + g, n_pieces - 1)
            valid_p = t * G + g < n_pieces
            cmask = cmask | jnp.where(valid_p, piece_mask_ref[0, 0, p], 0)

        # Shared per-chunk work: sigma row and the within-chunk occlusion
        # precedence mask along the tile's mean direction (MXU). Dead lanes
        # (outside the owning run's row interval) are folded into sigma
        # once per chunk — a zero-sigma lane contributes neither color nor
        # attenuation, so the per-group hit test needs no `live` term.
        sigma = jnp.where(
            live, jnp.maximum(f[sigma_row : sigma_row + 1, :], 0.0), 0.0
        )  # [1, R]
        key = (
            0.5
            * (
                (f[0:1, :] + f[3:4, :]) * mdir_ref[0, 0, 0]
                + (f[1:2, :] + f[4:5, :]) * mdir_ref[0, 0, 1]
                + (f[2:3, :] + f[5:6, :]) * mdir_ref[0, 0, 2]
            )
        )  # [1, runrows]
        key_col = jax.lax.dot_general(
            eye,
            key,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [runrows, 1] — lane->sublane move via MXU (no vector transpose)
        # HIGHEST precision is load-bearing: DEFAULT truncates the matmul
        # inputs to bf16 on TPU, so key_col != key for almost every key and
        # the strict-order construction below degrades to an inconsistent
        # relation for keys within bf16 eps (adjacent deep-tree cells are) —
        # pairs could occlude each other BOTH ways. Exact key_col keeps
        # `before` a strict total order.
        if ablate == "nobefore":
            # Timing ablation: skip the [R, R] precedence construction
            # (keeps the occ matmul; output is WRONG — profiling only).
            before_mm = eye.astype(mm_dt)
        else:
            before = (key_col < key) | ((key_col == key) & rid_lt_cid)
            before_mm = before.astype(mm_dt)

        for g in range(4):
            sl = slice(g * gsz, (g + 1) * gsz)

            # Per-quad-group saturation skip: once every ray in the group
            # has optical depth past od_cap, light < stop_thresh for any
            # further hit, so alive=False zeroes both the contribution and
            # the cum update — skipping the group is bitwise identical
            # (the whole-tile early exit above is the same test over all
            # rays; this catches groups that saturate at different depths).
            # ablate="noskip" disables it for A/B timing (output unchanged).
            group_on = (cmask >> g) % 2 == 1
            if ablate == "allon":
                # Mask-value ablation: forcing every group on prices the
                # group masks on any scene; output stays correct (masks are
                # conservative) — only slower. (Historically also the
                # NDC-cost model; NDC now carries real segment-AABB masks,
                # see the ndc branch in make_tile_inputs_fn.)
                group_on = cmask >= 0
            if ablate != "noskip":
                group_on = group_on & (jnp.min(state[sl, 0]) <= od_cap)

            @pl.when(group_on)
            def _(sl=sl):
                if ablate == "noslab":
                    # Timing ablation: skip the per-axis slab tests
                    # (output WRONG — profiling only).
                    sdt = sigma * dscale[sl] * 0.01
                else:
                    # Ray/box slab test, [gsz, runrows] per axis (FMA form).
                    tn = None
                    tf = None
                    for a in range(3):
                        t1 = (
                            f[a : a + 1, :] * invd_ref[0, sl, a : a + 1]
                            - oi[sl, a : a + 1]
                        )
                        t2 = (
                            f[3 + a : 4 + a, :] * invd_ref[0, sl, a : a + 1]
                            - oi[sl, a : a + 1]
                        )
                        tn_a = jnp.minimum(t1, t2)
                        tf_a = jnp.maximum(t1, t2)
                        tn = tn_a if tn is None else jnp.maximum(tn, tn_a)
                        tf = tf_a if tf is None else jnp.minimum(tf, tf_a)
                    entry = jnp.maximum(tn, tmin[sl])
                    # Clipped boxes are an exact spatial partition
                    # (build_tile_index): no replica dedup needed. Dead lanes
                    # are already sigma-folded (zero contribution either way).
                    hit = (tf > entry) & (entry <= tmax[sl])
                    sdt = jnp.where(
                        hit, sigma * (tf - entry + step_eps) * dscale[sl], 0.0
                    )
                cum_g = state[sl, 0:1]
                occ = cum_g + jax.lax.dot(
                    sdt.astype(mm_dt),
                    before_mm,
                    preferred_element_type=jnp.float32,
                )  # [gsz, runrows]
                light = jnp.exp(-occ)
                alive = light > stop_thresh
                contrib = jnp.where(
                    alive, light * (1.0 - jnp.exp(-sdt)), 0.0
                )

                # Per-channel decode on the MXU; compositing sums as
                # dot(X, ones) (MXU) instead of cross-lane reduces.
                basis_mm = basis_mm_all[sl]
                for c in range(n_channels if ablate != "nodecode" else 0):
                    coef_c = f[6 + c * basis_dim : 6 + (c + 1) * basis_dim, :]
                    raw_c = jax.lax.dot(
                        basis_mm,
                        coef_c.astype(mm_dt),
                        preferred_element_type=jnp.float32,
                    )
                    if fmt in ("SH", "SG"):
                        # sigmoid(x) = 0.5*tanh(x/2)+0.5: one EUP
                        # transcendental + FMA instead of exp/add/divide.
                        rgb_c = 0.5 * jnp.tanh(0.5 * raw_c) + 0.5
                    else:
                        rgb_c = raw_c
                    state[sl, 1 + c : 2 + c] = state[sl, 1 + c : 2 + c] + (
                        jax.lax.dot(
                            (contrib * rgb_c).astype(mm_dt),
                            ones_mm,
                            preferred_element_type=jnp.float32,
                        )
                    )
                # Freeze opacity once a ray stops (march/svox parity): a
                # stopped ray's remaining transmittance composites onto
                # the background unchanged (ADVICE r2).
                state[sl, 0:1] = cum_g + jax.lax.dot(
                    jnp.where(alive, sdt, 0.0).astype(mm_dt),
                    ones_mm,
                    preferred_element_type=jnp.float32,
                )

        return t + 1, n_started2

    init = (jnp.int32(0), jnp.minimum(jnp.int32(nbuf - 1), n_chunks))
    jax.lax.while_loop(cond, body, init)
    pad = jnp.zeros((rays, 8 - n_channels - 1), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [
            state[:, 1 : 1 + n_channels],
            jnp.exp(-state[:, 0:1]),
            pad,
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# Renderer driver
# ---------------------------------------------------------------------------


class TileRenderer:
    """Full-image pinhole renderer over a static tree (serving/eval path).

    Fast mode is an init-time choice (the instance index is threshold-
    dependent): construct with sigma_thresh/stop_thresh ~1e-2.
    """

    # Class-level default so instances built via __new__ (TileOptimizer
    # grafts one without running __init__) get the production kernel.
    ablate = ""

    def __init__(
        self,
        tree,
        step_size=1e-4,
        background_brightness=1.0,
        sigma_thresh=0.0,
        stop_thresh=0.0,
        grid_c=64,
        fine_c2=None,
        runrows=RUNROWS,
        use_bf16=True,
        rcap=256,
        w1cap=None,
        ccap=None,
        # nbuf 2: the round-5 on-chip knob sweep measured t16/r256 medians
        # 138/148/138 ms at nbuf 2/4/8 — one chunk in flight already hides
        # the DMA, and the shallower ring frees VMEM (scripts/
        # sweep_tile_knobs.py, docs/STATUS.md round-5 sweep table).
        nbuf=2,
        quantum=128,
        interpret=None,
        output="f32",
        tile=TILE,
        mesh=None,
        index=None,
        ndc=None,
        ablate=None,
    ):
        self.tree = tree
        # Timing-only kernel ablations (noskip/nobefore/noslab/nodecode) for
        # on-chip cost attribution; images are WRONG under any value other
        # than ""/"noskip". Default comes from PN_TILE_ABLATE for scripts.
        self.ablate = (
            os.environ.get("PN_TILE_ABLATE", "") if ablate is None else ablate
        )
        # LLFF forward-facing serving (reference octree/optimization.py:
        # 170-173 NDCConfig): rays are converted to NDC on device before the
        # tree-space transform. NDC rays keep straight lines (the transform
        # is projective), so phase 1's per-corner hull walk stays exact; the
        # quad-group frusta lose their shared apex, so group masks switch
        # to per-group segment-endpoint AABB planes — see
        # make_tile_inputs_fn.
        self.ndc = ndc
        self.opts = RenderOptions(
            step_size=step_size,
            background_brightness=background_brightness,
            sigma_thresh=sigma_thresh,
            stop_thresh=stop_thresh,
        )
        self.runrows = runrows
        self.use_bf16 = use_bf16
        self.interpret = (
            jax.default_backend() != "tpu" if interpret is None else interpret
        )
        if not self.interpret and quantum % 128 != 0:
            # Mosaic constraint: HBM slices along the lane dim must be
            # 128-aligned, so sub-128 piece DMAs only exist in interpret
            # mode (the TPU backend rejects them at compile time).
            raise ValueError(
                f"quantum={quantum} unsupported on TPU hardware: piece DMAs "
                "slice the soa lane dim, which Mosaic requires to be "
                "128-aligned. Use quantum=128 (or interpret=True)."
            )
        # `index` injects a prebuilt/cached build_tile_index result (the
        # build is minutes of host work on multi-M-leaf trees; serving
        # setups cache it per (tree, thresh, grid_c, fine_c2, runrows,
        # quantum)).
        if index is not None:
            if int(index["blk_quantum"]) != quantum or int(index["grid_c"]) != grid_c:
                raise ValueError(
                    "injected tile index was built with blk_quantum="
                    f"{index['blk_quantum']}/grid_c={index['grid_c']} but the "
                    f"renderer was constructed with quantum={quantum}/"
                    f"grid_c={grid_c}; the kernel would index blk_bbox with "
                    "the wrong block size (silently wrong renders)."
                )
            self.index = index
        else:
            self.index = build_tile_index(
                tree, sigma_thresh, grid_c, fine_c2, runrows, quantum=quantum
            )
        self.grid_c = grid_c
        self.fine_c2 = self.index["fine_c2"]
        self.rcap = rcap
        self.w1cap = w1cap
        # Piece cap: pieces ~ rows/quantum + one per run, so scale the
        # default with the packing factor (sticky growth handles outliers).
        self.ccap = ccap or rcap * max(2, runrows // quantum)
        self.nbuf = nbuf
        self.quantum = quantum
        self.fmt = tree.data_format.format
        self.basis_dim = tree.data_format.basis_dim
        self.n_channels = (self.index["sigma_row"] - 6) // self.basis_dim
        self.offset = jnp.asarray(tree.offset, jnp.float32)
        self.invradius = jnp.asarray(tree.invradius, jnp.float32)
        self.extra_data = (
            None if tree.extra_data is None else jnp.asarray(tree.extra_data)
        )
        self.output = output  # "f32" (eval/parity) | "u8" (serving)
        self.tile = tile  # pixels per tile side
        self.rays = tile * tile
        # Multi-chip serving: a 1-axis jax.sharding.Mesh shards the TILE
        # axis across devices — the Pallas kernel runs on each device's
        # tile slice via shard_map; ray-gen/phase-1 shard automatically
        # (GSPMD propagates the kernel's input sharding backward).
        self.mesh = mesh
        self._p2_cache = {}
        self._frame_cache = {}

    # -- jit caches ---------------------------------------------------------

    def _get_p2(self, n_tiles, ccap):
        key = (n_tiles, ccap)
        RAYS = self.rays
        if key not in self._p2_cache:
            fields = int(self.index["soa"].shape[1])
            od_cap = (
                -float(np.log(self.opts.stop_thresh))
                if self.opts.stop_thresh > 0
                else 1e30
            )
            kernel = functools.partial(
                _tile_kernel,
                fmt=self.fmt,
                basis_dim=self.basis_dim,
                n_channels=self.n_channels,
                sigma_row=int(self.index["sigma_row"]),
                rays=self.rays,
                runrows=self.runrows,
                quantum=self.quantum,
                use_bf16=self.use_bf16,
                step_eps=self.opts.step_size,
                stop_thresh=self.opts.stop_thresh,
                od_cap=od_cap,
                nbuf=self.nbuf,
                ablate=self.ablate,
            )
            bd = self.basis_dim
            nc = self.n_channels
            call = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
                    ),
                    pl.BlockSpec(
                        (1, 1, ccap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
                    ),
                    pl.BlockSpec(
                        (1, 1, ccap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
                    ),
                    pl.BlockSpec(
                        (1, 1, ccap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
                    ),
                    pl.BlockSpec(
                        (1, 1, ccap), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
                    ),
                    pl.BlockSpec(
                        (1, RAYS, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, RAYS, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, RAYS, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, RAYS, bd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (1, RAYS, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((n_tiles, RAYS, 8), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((self.nbuf, fields, self.runrows), jnp.float32),
                    pltpu.VMEM((RAYS, 8), jnp.float32),
                    pltpu.SemaphoreType.DMA(
                        (self.nbuf, self.runrows // self.quantum)
                    ),
                ],
                interpret=self.interpret,
            )
            self._p2_cache[key] = jax.jit(call)
        return self._p2_cache[key]

    # -- tile-input builder (shared by serving and the differentiable
    #    optimizer, octree/tile_opt.py) ------------------------------------

    def make_tile_inputs_fn(self, height, width, fx, rcap, w1cap, ccap=None):
        """Returns a traceable fn (c2w, csr, base, extra_data) ->
        (p2_args_without_soa, n_total [T], n_chunks [T], w1_over [T]): ray
        generation, tree-space transforms, SH basis, and the phase-1
        frustum walk (including DMA chunk-list expansion)."""
        ccap = ccap or self.ccap
        TILE = self.tile
        RAYS = self.rays
        hp = -(-height // TILE) * TILE
        wp = -(-width // TILE) * TILE
        n_tiles = (hp // TILE) * (wp // TILE)
        corners = _tile_corner_idx(TILE)
        Q = TILE // 2
        gc_idx = (
            np.arange(4)[:, None] * Q * Q + _GROUP_CORNER_OFF(Q)[None, :]
        ).reshape(-1)  # [16] quad-group corner ray indices
        del rcap  # vestigial: the flat-lattice phase 1 never truncates runs
        p1 = jax.vmap(
            functools.partial(
                _phase1,
                grid_c=self.grid_c,
                fine_c2=self.fine_c2,
                w1cap=w1cap,
                quantum=self.quantum,
                ccap=ccap,
            ),
            in_axes=(None, None, None, None, 0, 0, 0, 0, 0, 0, 0),
        )

        def tile_inputs(c2w, csr, base, extra_data, blk_bbox):
            # Pinhole rays at the TRUE size (principal point at the true
            # center): edge-pad to the tile grid via clamped pixel coords.
            # Rays are generated DIRECTLY in [T, RAYS] quad-major order from
            # iotas (the inverse of _untile's pixel mapping) — building an
            # [hp, wp] image and re-tiling it cost ~25 ms/frame of XLA
            # transpose/slice traffic at the 800^2 bench scale.
            tiles_x = wp // TILE
            Q = TILE // 2
            t_idx = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]
            r_idx = jnp.arange(RAYS, dtype=jnp.int32)[None, :]
            qi = r_idx // (Q * Q)
            rr = r_idx % (Q * Q)
            y = (t_idx // tiles_x) * TILE + (qi // 2) * Q + rr // Q
            x = (t_idx % tiles_x) * TILE + (qi % 2) * Q + rr % Q
            xf = jnp.minimum(x.astype(jnp.float32), width - 1.0)
            yf = jnp.minimum(y.astype(jnp.float32), height - 1.0)
            cam_dirs = jnp.stack(
                [
                    (xf - width * 0.5) / fx,
                    -(yf - height * 0.5) / fx,
                    -jnp.ones_like(xf),
                ],
                axis=-1,
            )  # [T, RAYS, 3]
            # precision="highest" is load-bearing: DEFAULT runs this on the
            # MXU with bf16-truncated inputs (~4e-3 relative), giving every
            # ray a ~1e-3 pointing error vs the host/march ray gen — whole
            # boundary pixels land in different cells. Exact f32 here costs
            # nothing (a 3x3 rotation).
            d_world = jnp.einsum(
                "ij,trj->tri", c2w[:3, :3], cam_dirs, precision="highest"
            )  # [T, RAYS, 3]
            if self.ndc is not None:
                # Device mirror of data/rays.py::convert_to_ndc (near=1):
                # shift to the near plane, project. Origins become per-ray.
                ow = jnp.broadcast_to(c2w[:3, 3], d_world.shape)
                tshift = -(1.0 + ow[..., 2]) / d_world[..., 2]
                ow = ow + tshift[..., None] * d_world
                fx2w = 2.0 * self.ndc["focal"] / self.ndc["width"]
                fy2h = 2.0 * self.ndc["focal"] / self.ndc["height"]
                oz = ow[..., 2]
                o0 = -fx2w * ow[..., 0] / oz
                o1 = -fy2h * ow[..., 1] / oz
                o2 = 1.0 + 2.0 / oz
                d0 = -fx2w * (d_world[..., 0] / d_world[..., 2] - ow[..., 0] / oz)
                d1 = -fy2h * (d_world[..., 1] / d_world[..., 2] - ow[..., 1] / oz)
                d2 = -2.0 / oz
                o_space = jnp.stack([o0, o1, o2], axis=-1)
                d_world = jnp.stack([d0, d1, d2], axis=-1)
                viewdirs = d_world / jnp.linalg.norm(
                    d_world, axis=-1, keepdims=True
                )
                o = o_space * self.invradius + self.offset  # per-ray
            else:
                viewdirs = d_world / jnp.linalg.norm(
                    d_world, axis=-1, keepdims=True
                )
                o = jnp.broadcast_to(
                    c2w[:3, 3] * self.invradius + self.offset, d_world.shape
                )
            d = viewdirs * self.invradius
            delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1)
            dn = d * delta_scale[..., None]
            # Floor at 1e-6 (sign-preserving), NOT 1e-9: the kernel's slab
            # test runs in FMA form (box*invd - o*invd), which cancels
            # catastrophically in f32 when invd ~ 1e9 (exactly-axis-aligned
            # rays — every NDC ray of a fronto-parallel camera) — measured
            # ±60 t-units of error, breaking hit tests outright. At
            # invd <= 1e6 the error is ~1e-3 t-units, and a ray with
            # |dn| < 1e-6 drifts < 2e-6 laterally across the whole unit
            # box (¼00 of a max-depth cell), so inclusion semantics hold.
            safe_dn = jnp.where(
                jnp.abs(dn) < 1e-6, jnp.where(dn < 0, -1e-6, 1e-6), dn
            )
            invd = 1.0 / safe_dn
            t0 = (0.0 - o) * invd
            t1 = (1.0 - o) * invd
            tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0) + 1e-5
            tmax = jnp.min(jnp.maximum(t0, t1), -1) - 1e-5
            basis = _ray_basis(
                self.fmt, self.basis_dim, viewdirs.reshape(-1, 3), extra_data
            ).reshape(n_tiles, RAYS, -1)

            ray_ok = tmax > tmin  # [T, RAYS]
            any_hit = jnp.any(ray_ok, axis=1)
            span_lo = jnp.min(jnp.where(ray_ok, tmin, jnp.inf), axis=1)
            span_hi = jnp.max(jnp.where(ray_ok, tmax, -jnp.inf), axis=1)

            # Quad-group frustum planes: each 2x2 pixel quad's 4 corner
            # rays span its sub-frustum (clamped border pixels are still
            # the extreme rays — clamping is monotone). Side planes
            # contain the shared apex; inward orientation via the quad
            # mean direction. Conservative by construction: a hittable
            # box is inside every half-space, so a cleared mask bit can
            # only be a true miss.
            if self.ndc is not None:
                # NDC rays share no apex, so the frustum-cone test below is
                # unsound. But each ray's [tmin, tmax] span is a straight
                # SEGMENT in tree space, so the AABB of the group's segment
                # endpoints bounds every segment (segments are convex):
                # 4 axis-normal lateral planes (±x, ±y) per group with
                # per-plane offsets from that AABB give a sound,
                # segment-limited group test through the same
                # sign-split-matmul machinery (goff generalizes n·apex).
                # Conservative: a box a group ray truly hits within
                # [tmin, tmax] intersects the AABB; endpoint float noise
                # (~4e-6 in tree units) is far under the 3e-4 test slack.
                Q2 = Q * Q
                axnorm = jnp.asarray(
                    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]],
                    jnp.float32,
                )
                gplanes = jnp.broadcast_to(
                    jnp.tile(axnorm, (4, 1))[None], (n_tiles, 16, 3)
                )
                e0 = o + tmin[..., None] * dn  # [T, RAYS, 3]
                e1 = o + tmax[..., None] * dn
                okr = ray_ok[..., None]
                big0 = jnp.float32(1e4)
                elo = jnp.minimum(
                    jnp.where(okr, e0, big0), jnp.where(okr, e1, big0)
                ).reshape(n_tiles, 4, Q2, 3)
                ehi = jnp.maximum(
                    jnp.where(okr, e0, -big0), jnp.where(okr, e1, -big0)
                ).reshape(n_tiles, 4, Q2, 3)
                glo = jnp.min(elo, axis=2)  # [T, 4, 3]
                ghi = jnp.max(ehi, axis=2)
                goff = jnp.stack(
                    [glo[..., 0], -ghi[..., 0], glo[..., 1], -ghi[..., 1]],
                    axis=-1,
                ).reshape(n_tiles, 16)
            else:
                gdirs = dn[:, gc_idx].reshape(n_tiles, 4, 4, 3)
                A, B, Cq, D = (gdirs[:, :, k] for k in range(4))
                nrm = jnp.stack(
                    [
                        jnp.cross(A, B),
                        jnp.cross(B, D),
                        jnp.cross(D, Cq),
                        jnp.cross(Cq, A),
                    ],
                    axis=2,
                )  # [T, 4 groups, 4 planes, 3]
                dmean_g = jnp.mean(gdirs, axis=2)
                sgn_n = jnp.sign(
                    jnp.sum(nrm * dmean_g[:, :, None, :], axis=-1, keepdims=True)
                )
                nrm = nrm * jnp.where(sgn_n == 0, 1.0, sgn_n)
                nrm = nrm / (
                    jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12
                )
                gplanes = nrm.reshape(n_tiles, 16, 3)
                # Per-plane offsets n·apex (apex = the tile's ray-0 origin;
                # all pinhole rays share it). HIGHEST for the same reason
                # as the sd matmuls in _phase1.
                goff = jnp.einsum(
                    "tpc,tc->tp", gplanes, o[:, 0], precision="highest"
                )

            (
                chunk_c0, chunk_lo, chunk_hi, chunk_mask, n_kept_p,
                n_total, w1_over, n_pieces_pre,
            ) = p1(
                csr, base, self.index["margin"], blk_bbox,
                o[:, corners], dn[:, corners],
                gplanes, goff, span_lo, span_hi, any_hit,
            )
            # Kernel iterates the post-drop piece list; saturation
            # detection keys on the pre-merge emission count (rcap) and
            # the PRE-drop piece count (ccap).
            nck = jnp.minimum(n_kept_p, ccap).astype(jnp.int32)
            z = jnp.zeros_like(nck)
            meta = jnp.stack([nck, z, z, z], axis=-1)
            mean_d = jnp.mean(dn, axis=1)
            mdir = jnp.concatenate(
                [mean_d, jnp.zeros((n_tiles, 1), jnp.float32)], axis=-1
            )[:, None, :]
            aux = jnp.stack(
                [delta_scale, tmin, tmax, jnp.zeros_like(tmin)], axis=-1
            )
            pad1 = jnp.zeros((n_tiles, RAYS, 1), jnp.float32)
            p2_args = (
                meta[:, None, :],
                chunk_c0[:, None, :],
                chunk_lo[:, None, :],
                chunk_hi[:, None, :],
                chunk_mask[:, None, :],
                jnp.concatenate([o, pad1], axis=-1),
                jnp.concatenate([invd, pad1], axis=-1),
                aux,
                mdir,
                basis,
            )
            return p2_args, n_total, n_pieces_pre, w1_over

        return tile_inputs

    # -- whole-frame device function ----------------------------------------

    def _frame_fn(self, height, width, fx, rcap, ccap):
        """One jitted (c2w, soa, csr, base, extra) -> (img, n_max) frame.

        Everything — ray generation, tree-space transforms, SH basis,
        phase 1, the Pallas kernel, image assembly — runs in ONE device
        dispatch so the host only ships a 4x4 pose in and the image out
        (the axon tunnel charges ~28 ms per round trip). soa stays an
        argument: jit must not close over multi-GB arrays (CLAUDE.md).
        """
        if self.w1cap is None:
            self.w1cap = int(
                min(
                    self.grid_c,
                    np.ceil(np.sqrt(3) * self.tile / fx * self.grid_c) + 3,
                )
            )
        w1cap = self.w1cap
        key = (height, width, float(fx), rcap, ccap, w1cap)
        if key in self._frame_cache:
            return self._frame_cache[key]

        TILE = self.tile
        RAYS = self.rays
        hp = -(-height // TILE) * TILE
        wp = -(-width // TILE) * TILE
        n_tiles = (hp // TILE) * (wp // TILE)
        nc = self.n_channels
        tile_inputs = self.make_tile_inputs_fn(height, width, fx, rcap, w1cap, ccap)

        if self.mesh is not None:
            # Multi-chip: pad the tile axis to a device multiple (padded
            # tiles carry n_pieces=0 metas -> background no-ops, dropped at
            # assembly) and run the kernel on each device's slice.
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            axis = self.mesh.axis_names[0]
            ndev = self.mesh.shape[axis]
            tpad = -(-n_tiles // ndev) * ndev
            p2_local = self._get_p2(tpad // ndev, ccap)
            run_p2 = shard_map(
                lambda *a: p2_local(*a),
                mesh=self.mesh,
                in_specs=(P(axis),) * 10 + (P(),),
                out_specs=P(axis),
                check_vma=False,
            )

            def call_p2(p2_args, soa):
                padded = tuple(
                    jnp.pad(a, ((0, tpad - n_tiles),) + ((0, 0),) * (a.ndim - 1))
                    for a in p2_args
                )
                return run_p2(*padded, soa)[:n_tiles]

        else:
            p2 = self._get_p2(n_tiles, ccap)

            def call_p2(p2_args, soa):
                return p2(*p2_args, soa)

        def frame(c2w, soa, csr, base, extra_data, blk_bbox):
            p2_args, n_total, n_chunks, w1_over = tile_inputs(
                c2w, csr, base, extra_data, blk_bbox
            )
            out = call_p2(p2_args, soa)
            rgb = out[:, :, :nc]
            light = out[:, :, nc]
            img = rgb + light[..., None] * self.opts.background_brightness
            img = _untile(img, hp, wp, TILE)[:height, :width]
            n_max = jnp.max(n_total)
            nc_max = jnp.max(n_chunks)
            w1_max = jnp.max(w1_over).astype(jnp.int32)
            if self.output == "u8":
                # One packed u8 payload (image + n_max/nc_max/w1_over
                # bytes): the tunnel charges ~28 ms per fetch and ~4 ms/MB,
                # so one small transfer replaces a float image + scalar
                # round trips.
                img8 = jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
                tail = jax.lax.bitcast_convert_type(
                    jnp.stack([n_max, nc_max, w1_max]), jnp.uint8
                ).reshape(-1)
                return jnp.concatenate([img8.reshape(-1), tail])
            return img, n_max, nc_max, w1_max

        fn = jax.jit(frame)
        self._frame_cache[key] = fn
        return fn

    def render_persp_async(self, c2w, height, width, fx):
        """Dispatch one frame; returns the device payload (no host sync).
        Use for pipelined serving: fetch frame k while k+1 renders. The
        rcap/w1cap saturation checks run at fetch time via finish_frame."""
        fn = self._frame_fn(height, width, fx, self.rcap, self.ccap)
        idx = self.index
        return fn(
            jnp.asarray(np.asarray(c2w, np.float32)),
            idx["soa"], idx["csr"], idx["base"], self.extra_data,
            idx["blk_bbox"],
        )

    def _fetch(self, out, height, width):
        """Device payload -> (img, n_max, nc_max, w1_over) on host."""
        if self.output == "u8":
            payload = np.asarray(out)
            img = payload[:-12].reshape(height, width, self.n_channels)
            n_max, nc_max, w1_over = (int(x) for x in payload[-12:].view(np.int32))
        else:
            img, n_max, nc_max, w1_over = out
            img = np.asarray(img)
            n_max, nc_max, w1_over = int(n_max), int(nc_max), int(w1_over)
        return img, n_max, nc_max, w1_over

    def _check_caps(self, n_max, nc_max, w1_over):
        """Grow ccap/w1cap on saturation. Returns True if a re-render
        is needed (the frame dropped geometry). n_max (valid runs per
        tile) is informational only: the flat-lattice phase 1 has no run
        cap, so runs never truncate."""
        import warnings

        del n_max
        regrow = False
        if w1_over > 0:
            # Undersized lateral-1 window (camera far outside the volume):
            # phase 1 masked real cells. Regrow with 25% headroom — exact
            # (+w1_over) growth caused one ~3 min remote recompile PER POSE
            # while an orbiting camera's window need crept up (measured:
            # 4 consecutive regrow-recompiles in a 24-frame orbit at 800²);
            # the margin makes regrowth settle in one step for a
            # neighborhood of poses at a few extra phase-1 rows.
            self.w1cap = int(
                min(
                    self.grid_c,
                    self.w1cap + w1_over + max(2, self.w1cap // 4),
                )
            )
            regrow = True
        if nc_max > self.ccap:
            if self.ccap >= 16384:
                warnings.warn(
                    f"tile chunk capacity clipped at {self.ccap} (< {nc_max}): "
                    "frame rendered with truncated geometry"
                )
            else:
                self.ccap = int(min(16384, 2 * self.ccap))
                regrow = True
        return regrow

    def render_persp(self, c2w, height, width, fx):
        """Render an image [H, W, nc] (numpy; float32, or uint8 when the
        renderer was constructed with output="u8")."""
        while True:
            out = self.render_persp_async(c2w, height, width, fx)
            img, n_max, nc_max, w1_over = self._fetch(out, height, width)
            if not self._check_caps(n_max, nc_max, w1_over):
                return img
            # Sticky growth: a new compile, rare, persists per renderer.
