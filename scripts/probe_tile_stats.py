"""Host-side tile-renderer work model (round-3 perf planning).

Rebuilds the bench tree + tile index in numpy, mirrors phase-1's window
logic for a set of camera poses, and reports where phase-2 kernel work
goes: run counts, run lengths, 128-chunk quantization waste, and the
EXACT hit fraction (rows that actually intersect >=1 tile ray) on a
sampled subset of tiles. Evaluates design variants without compiling
anything:

  --tile 8|16|32      pixel tile side
  --grid_c 64|128     coarse grid resolution
  --c2 128            finer lateral-2 key resolution (two-level key)
  --trim              per-(slab, w1) lateral-2 hull trimming
  --win 128|32        row window quantum (DMA granularity)

Run on host only (numpy); no jax needed.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_octree_render import make_tree, orbit_pose  # noqa: E402


def build_index_np(tree, sigma_thresh, C):
    leaves = tree._leaf_nodes()
    corner = tree._cell_corner(leaves).astype(np.float64)
    size = tree._cell_size(leaves).astype(np.float64)
    data = tree.data[leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]]
    sigma = data[:, -1].astype(np.float32)
    keep = (sigma > 0.0) & (sigma > sigma_thresh)
    corner, size = corner[keep], size[keep]

    lo_cell = np.clip((corner * C).astype(np.int64), 0, C - 1)
    hi_cell = np.clip(np.ceil((corner + size[:, None]) * C).astype(np.int64) - 1, 0, C - 1)
    span = hi_cell - lo_cell + 1
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
    inst_leaf = np.concatenate(inst_leaf)
    inst_vox = np.concatenate(inst_vox, axis=0)
    return corner, size, inst_leaf, inst_vox, int(keep.sum())


def sort_axis(inst_leaf, inst_vox, corner, size, axis, C):
    p = (axis, (axis + 1) % 3, (axis + 2) % 3)
    key = (inst_vox[:, p[0]] * C + inst_vox[:, p[1]]) * C + inst_vox[:, p[2]]
    order = np.argsort(key, kind="stable")
    csr = np.zeros(C**3 + 1, np.int64)
    csr[1:] = np.cumsum(np.bincount(key, minlength=C**3))
    lo = corner[inst_leaf[order]]
    hi = lo + size[inst_leaf[order], None]
    return csr, lo, hi


def tile_corner_rays(reso, fx, c2w, T):
    """[(n_tiles, 4, 3) origins (same), dirs] in tree space [0,1]^3 with
    tree radius 0.5 center 0.5 (bench tree)."""
    hp = -(-reso // T) * T
    n_side = hp // T
    # corner pixel coords of each tile (0, T-1 within tile)
    ty, tx = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    cx = np.stack([tx * T, tx * T + T - 1], -1)  # [n,n,2]
    cy = np.stack([ty * T, ty * T + T - 1], -1)
    px = np.minimum(cx, reso - 1).astype(np.float64)
    py = np.minimum(cy, reso - 1).astype(np.float64)
    # 4 corners: (y0x0, y0x1, y1x0, y1x1)
    PX = np.stack([px[..., 0], px[..., 1], px[..., 0], px[..., 1]], -1)
    PY = np.stack([py[..., 0], py[..., 0], py[..., 1], py[..., 1]], -1)
    dirs_cam = np.stack(
        [(PX - reso * 0.5) / fx, -(PY - reso * 0.5) / fx, -np.ones_like(PX)], -1
    )  # [n,n,4,3]
    d_world = dirs_cam @ c2w[:3, :3].T
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
    invradius, offset = 1.0, 0.0  # bench tree: radius .5 center .5 -> world==tree? no:
    # tree2world: world = (tree - offset)/invr ; offset = .5*(1-c/r) = 0, invr = 1/(2*0.5)=1
    o = c2w[:3, 3] * invradius + offset
    d = d_world * invradius
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o, dn.reshape(-1, 4, 3)


def phase1_np(csr3, o, d4, C, c2=None, trim=False):
    """Mirror of _phase1 for ONE tile (numpy, scalar loop over slabs).
    Returns list of (start, len) ranges (csr-local to the chosen axis) and
    the axis. c2: finer lateral-2 key reso (csr built at [C, C, c2])."""
    c2 = c2 or C
    min_abs = np.min(np.abs(d4), axis=0)
    axis = int(np.argmax(min_abs))
    perm = [axis, (axis + 1) % 3, (axis + 2) % 3]
    op = np.broadcast_to(o, (4, 3))[:, perm]
    dp = d4[:, perm]
    sgn = np.sign(dp[:, 0].sum())
    safe_d = np.where(np.abs(dp) < 1e-9, 1e-9, dp)

    # tile t-span over corner rays only (approx; fine for stats)
    with np.errstate(divide="ignore"):
        t0 = (0.0 - op) / safe_d
        t1 = (1.0 - op) / safe_d
    tmin = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
    tmax = np.maximum(t0, t1).min(-1)
    ok = tmax > tmin
    if not ok.any():
        return [], axis
    span_lo, span_hi = tmin[ok].min(), tmax[ok].max()

    s = np.arange(C)
    a_pos = (s if sgn >= 0 else C - 1 - s).astype(np.int64)
    plane_lo = a_pos / C
    plane_hi = (a_pos + 1.0) / C
    ta = (plane_lo[:, None] - op[None, :, 0]) / safe_d[None, :, 0]
    tb = (plane_hi[:, None] - op[None, :, 0]) / safe_d[None, :, 0]
    t_in = np.minimum(ta, tb)
    t_out = np.maximum(ta, tb)
    slab_valid = ((t_in <= span_hi) & (t_out >= span_lo)).any(1)

    ts = np.stack([t_in, t_out], -1)  # [C,4,2]
    lat = op[None, :, None, 1:] + ts[..., None] * dp[None, :, None, 1:]
    lat = np.clip(lat, -1.0, 2.0)
    runs = []
    sgn1 = np.sign(dp[:, 1].sum())
    for si in range(C):
        if not slab_valid[si]:
            continue
        pts = lat[si].reshape(-1, 2)  # 8 points (l1, l2)
        l1_lo = np.floor(pts[:, 0].min() * C - 1e-4).astype(int)
        l1_hi = np.floor(pts[:, 0].max() * C + 1e-4).astype(int)
        l1_lo, l1_hi = np.clip([l1_lo, l1_hi], 0, C - 1)
        w1s = range(l1_lo, l1_hi + 1) if sgn1 >= 0 else range(l1_hi, l1_lo - 1, -1)
        for w1 in w1s:
            if trim:
                # exact hull-strip intersection in l2: clip the 8-pt hull
                # to l1 in [w1/C, (w1+1)/C] by lerping polygon edges.
                lo_s, hi_s = w1 / C, (w1 + 1) / C
                P = convex_hull(pts)
                seg = clip_poly_strip(P, lo_s, hi_s)
                if seg is None:
                    continue
                l2_lo = np.floor(seg[0] * c2 - 1e-4).astype(int)
                l2_hi = np.floor(seg[1] * c2 + 1e-4).astype(int)
            else:
                l2_lo = np.floor(pts[:, 1].min() * c2 - 1e-4).astype(int)
                l2_hi = np.floor(pts[:, 1].max() * c2 + 1e-4).astype(int)
            l2_lo, l2_hi = np.clip([l2_lo, l2_hi], 0, c2 - 1)
            cell_lo = (a_pos[si] * C + w1) * c2 + l2_lo
            cell_hi = (a_pos[si] * C + w1) * c2 + l2_hi
            st = csr3[axis][cell_lo]
            en = csr3[axis][cell_hi + 1]
            if en > st:
                runs.append((int(st), int(en - st)))
    return runs, axis


def convex_hull(pts):
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        h = []
        for p in points:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def clip_poly_strip(P, lo, hi):
    """l2 range of convex polygon P (cols l1,l2) within l1-strip [lo,hi]."""
    n = len(P)
    vals = []
    for i in range(n):
        a, b = P[i], P[(i + 1) % n]
        if lo <= a[0] <= hi:
            vals.append(a[1])
        for bound in (lo, hi):
            if (a[0] - bound) * (b[0] - bound) < 0:
                t = (bound - a[0]) / (b[0] - a[0])
                vals.append(a[1] + t * (b[1] - a[1]))
    if not vals:
        return None
    return min(vals), max(vals)


def exact_hit_rows(o, dn16, lo, hi, rows):
    """Of soa rows `rows`, which intersect >=1 of the 16 sample rays."""
    L, H = lo[rows], hi[rows]  # [R,3]
    t1 = (L[None] - o) / dn16[:, None, :]  # [16,R,3]
    t2 = (H[None] - o) / dn16[:, None, :]
    tn = np.minimum(t1, t2).max(-1)
    tf = np.maximum(t1, t2).min(-1)
    return ((tf > np.maximum(tn, 0.0))).any(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reso", type=int, default=800)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--grid_c", type=int, default=64)
    ap.add_argument("--c2", type=int, default=0, help="finer lateral-2 reso")
    ap.add_argument("--trim", action="store_true")
    ap.add_argument("--win", type=int, default=128)
    ap.add_argument("--poses", type=int, default=2)
    ap.add_argument("--sample_tiles", type=int, default=60)
    args = ap.parse_args()
    C, T = args.grid_c, args.tile
    c2 = args.c2 or C

    t0 = time.time()
    tree = make_tree(args.depth)
    print(f"tree built {time.time()-t0:.0f}s: {tree.n_leaves} leaves")
    t0 = time.time()
    corner, size, inst_leaf, inst_vox, n_kept = build_index_np(tree, 1e-2, C)
    n_inst = inst_leaf.shape[0]
    print(
        f"index {time.time()-t0:.0f}s: kept_leaves={n_kept} instances={n_inst} "
        f"(repl x{n_inst/max(n_kept,1):.2f})"
    )
    if c2 != C:
        # two-level key: rebuild vox with finer lateral-2. Approximate by
        # re-binning instance centers on the l2 axis at reso c2 per axis copy.
        pass  # handled per-axis below
    csr3, lo3, hi3 = {}, {}, {}
    for axis in range(3):
        p = (axis, (axis + 1) % 3, (axis + 2) % 3)
        if c2 == C:
            key = (inst_vox[:, p[0]] * C + inst_vox[:, p[1]]) * C + inst_vox[:, p[2]]
        else:
            ctr = (corner[inst_leaf] + 0.5 * size[inst_leaf, None])
            v2 = np.clip((ctr[:, p[2]] * c2).astype(np.int64), 0, c2 - 1)
            key = (inst_vox[:, p[0]] * C + inst_vox[:, p[1]]) * c2 + v2
        order = np.argsort(key, kind="stable")
        csr = np.zeros(C * C * c2 + 1, np.int64)
        csr[1:] = np.cumsum(np.bincount(key, minlength=C * C * c2))
        csr3[axis] = csr
        lo3[axis] = corner[inst_leaf[order]]
        hi3[axis] = lo3[axis] + size[inst_leaf[order], None]

    fx = args.reso * 1.1
    rng = np.random.default_rng(0)
    for pi in range(args.poses):
        c2w = orbit_pose(0.4 + 0.31 * pi)
        o, dn4 = tile_corner_rays(args.reso, fx, c2w, T)
        n_tiles = dn4.shape[0]
        tot_runs = tot_rows = tot_chunks = 0
        max_runs = 0
        t0 = time.time()
        sample = set(rng.choice(n_tiles, size=min(args.sample_tiles, n_tiles), replace=False).tolist())
        s_rows = s_hit = 0
        for ti in range(n_tiles):
            runs, axis = phase1_np(csr3, o, dn4[ti], C, c2=c2, trim=args.trim)
            nrows = sum(l for _, l in runs)
            nch = sum((s + l - 1) // args.win - s // args.win + 1 for s, l in runs)
            tot_runs += len(runs)
            tot_rows += nrows
            tot_chunks += nch
            max_runs = max(max_runs, len(runs))
            if ti in sample and runs:
                rows = np.concatenate([np.arange(s, s + l) for s, l in runs])
                # 16 sample rays: corner dirs + 12 interpolants
                w = rng.random((16, 4))
                w /= w.sum(1, keepdims=True)
                dn16 = w @ dn4[ti]
                dn16 /= np.linalg.norm(dn16, axis=-1, keepdims=True)
                hitm = exact_hit_rows(o, dn16, lo3[axis], hi3[axis], rows)
                s_rows += rows.size
                s_hit += int(hitm.sum())
        kern_rows = tot_chunks * args.win
        print(
            f"pose {pi}: tiles={n_tiles} runs={tot_runs} rows={tot_rows/1e6:.2f}M "
            f"chunks(win{args.win})={tot_chunks} kernel_rows={kern_rows/1e6:.2f}M "
            f"runs/tile max={max_runs} mean={tot_runs/n_tiles:.0f} "
            f"quant_waste={kern_rows/max(tot_rows,1):.2f}x "
            f"hit_frac(sampled)={s_hit/max(s_rows,1):.3f} "
            f"({time.time()-t0:.0f}s)"
        )


if __name__ == "__main__" and not os.environ.get("OCCL"):
    main()


def occlusion_model(csr3, lo3, hi3, sig3, o, dn4, C, c2, trim, win, n_ray=10,
                    od_cap=4.6, step_eps=1e-4):
    """Chunk counts under different early-exit rules for ONE pose.

    Per tile: take an n_ray x n_ray uniform ray grid, walk runs in order,
    accumulate optical depth, and count win-row chunks consumed until:
      rule A (current): min over ALL rays of cum > od_cap
      rule B (+volume gate): rays missing the [0,1]^3 box start poisoned
      rule C (oracle): rays that hit NOTHING in the whole list are ignored
    Returns dict of chunk totals.
    """
    n_tiles = dn4.shape[0]
    tots = {"A": 0, "B": 0, "C": 0, "rows": 0, "chunks": 0}
    for ti in range(n_tiles):
        runs, axis = phase1_np(csr3, o, dn4[ti], C, c2=c2, trim=trim)
        if not runs:
            continue
        # uniform ray grid via bilinear interp of corner dirs
        g = (np.arange(n_ray) + 0.5) / n_ray
        wy, wx = np.meshgrid(g, g, indexing="ij")
        d = ((1 - wy)[..., None] * ((1 - wx)[..., None] * dn4[ti][0] + wx[..., None] * dn4[ti][1])
             + wy[..., None] * ((1 - wx)[..., None] * dn4[ti][2] + wx[..., None] * dn4[ti][3]))
        d = d.reshape(-1, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        R = d.shape[0]
        with np.errstate(divide="ignore"):
            invd = 1.0 / np.where(np.abs(d) < 1e-9, 1e-9, d)
        tb0 = (0.0 - o) * invd
        tb1 = (1.0 - o) * invd
        tmin = np.maximum(np.minimum(tb0, tb1).max(1), 0.0)
        tmax = np.maximum(tb0, tb1).min(1)
        vol_ok = tmax > tmin
        lo, hi, sg = lo3[axis], hi3[axis], sig3[axis]
        cum = np.zeros(R)
        nA = nB = None
        ever_hit = np.zeros(R, bool)
        chunks_cum = 0
        state = []  # (chunks_cum_after, cum_snapshot)
        for (s, l) in runs:
            nch = (s + l - 1) // win - s // win + 1
            L, H = lo[s:s+l], hi[s:s+l]
            t1 = (L[None] - o) * invd[:, None, :]
            t2 = (H[None] - o) * invd[:, None, :]
            tn = np.maximum(np.minimum(t1, t2).max(-1), tmin[:, None])
            tf = np.maximum(t1, t2).min(-1)
            hitm = tf > tn
            ever_hit |= hitm.any(1)
            sdt = np.where(hitm, np.maximum(sg[s:s+l][None], 0.0) * (tf - tn + step_eps), 0.0)
            cum = cum + sdt.sum(1)
            chunks_cum += nch
            state.append((chunks_cum, cum.copy()))
            if nA is None and cum.min() > od_cap:
                nA = chunks_cum
            if nB is None and np.where(vol_ok, cum, np.inf).min() > od_cap:
                nB = chunks_cum
        total = chunks_cum
        tots["chunks"] += total
        tots["rows"] += sum(l for _, l in runs)
        tots["A"] += nA if nA is not None else total
        tots["B"] += nB if nB is not None else total
        # rule C: ignore rays that never hit anything across the whole list
        nC = None
        for (ck, cm) in state:
            if np.where(ever_hit, cm, np.inf).min() > od_cap:
                nC = ck
                break
        tots["C"] += nC if nC is not None else total
    return tots


def main_occl():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reso", type=int, default=800)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--grid_c", type=int, default=64)
    ap.add_argument("--c2", type=int, default=0)
    ap.add_argument("--trim", action="store_true")
    ap.add_argument("--win", type=int, default=128)
    args = ap.parse_args()
    C, T = args.grid_c, args.tile
    c2 = args.c2 or C
    tree = make_tree(args.depth)
    corner, size, inst_leaf, inst_vox, n_kept = build_index_np(tree, 1e-2, C)
    leaves = tree._leaf_nodes()
    data_sig = tree.data[leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]][:, -1]
    sig_kept = data_sig[(data_sig > 0.0) & (data_sig > 1e-2)]
    csr3, lo3, hi3, sig3 = {}, {}, {}, {}
    for axis in range(3):
        p = (axis, (axis + 1) % 3, (axis + 2) % 3)
        if c2 == C:
            key = (inst_vox[:, p[0]] * C + inst_vox[:, p[1]]) * C + inst_vox[:, p[2]]
        else:
            ctr = (corner[inst_leaf] + 0.5 * size[inst_leaf, None])
            v2 = np.clip((ctr[:, p[2]] * c2).astype(np.int64), 0, c2 - 1)
            key = (inst_vox[:, p[0]] * C + inst_vox[:, p[1]]) * c2 + v2
        order = np.argsort(key, kind="stable")
        csr = np.zeros(C * C * c2 + 1, np.int64)
        csr[1:] = np.cumsum(np.bincount(key, minlength=C * C * c2))
        csr3[axis] = csr
        lo3[axis] = corner[inst_leaf[order]]
        hi3[axis] = lo3[axis] + size[inst_leaf[order], None]
        sig3[axis] = np.asarray(sig_kept)[order]
    fx = args.reso * 1.1
    c2w = orbit_pose(0.4)
    o, dn4 = tile_corner_rays(args.reso, fx, c2w, T)
    t0 = time.time()
    tots = occlusion_model(csr3, lo3, hi3, sig3, o, dn4, C, c2, args.trim, args.win)
    print(f"win={args.win} C={C} c2={c2} trim={args.trim}: total_chunks={tots['chunks']} "
          f"rows={tots['rows']/1e6:.2f}M exitA={tots['A']} exitB={tots['B']} "
          f"exitC={tots['C']} ({time.time()-t0:.0f}s)")


if __name__ == "__main__" and os.environ.get("OCCL"):
    main_occl()
