"""Two-phase deferred octree rendering (the TPU-shaped fast path).

Replaces marching-with-inline-shading (renderer.render_rays, kept as the
parity oracle) for both evaluation and optimization. Reference capability:
svox VolumeRenderer CUDA fwd/bwd (octree/optimization.py:174-226,
octree/nerf/utils.py:448-498).

Why two phases: TPU random-row gather cost scales with the gathered table's
footprint (measured ~9 ns/row at 8 MB vs ~59 ns/row at 235 MB,
scripts/bench_gather.py), and a lockstep scan pays every step for every ray.
So:

  Phase 1 — march (non-differentiable geometry): lax.while_loop where each
  step does one i32 accel-grid gather + one f32 gather into a sigma-only
  table (~50x narrower than the full leaf data). Cells with sigma above
  threshold are pushed into fixed-K per-ray contributor slots (cell id +
  world-scale delta_t). The loop runs device-side until every ray in the
  bucket is done or a segment cap is hit (one dispatch, no per-pass host
  round trips — the axon tunnel costs ~28 ms per sync). svox semantics:
  sigma<thresh cells are skipped entirely (contribute neither color nor
  attenuation), light below stop_thresh stops the ray.

  Phase 2 — shade (differentiable): ONE gather of full data rows for the
  contributor slots only, exact transmittance compositing over the slots,
  per-ray SH/SG basis dot, sigmoid. Gradients w.r.t. leaf data flow through
  this gather (scatter-add transpose) and through sigma->weights — matching
  svox's backward, which also only touches marched cells above threshold.

Phase 2 can run strip-wise (K_STRIP slots at a time with carried
transmittance) so rays only pay gathers for slots they actually filled;
finished rays gather row 0, which stays cache-hot.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plenoctree_tpu.octree.renderer import (
    RenderOptions,
    _locate,
    _prep_rays,
    split_arrays,
)

K_STRIP = 8  # shading strip width (slots per strip jit)


def init_carry(rp, n_rays, K):
    """March carry: (t, light, count, cells [R,K], dts [R,K])."""
    tmin = rp[4]
    return {
        "t": tmin,
        "light": jnp.ones_like(tmin),
        "count": jnp.zeros((n_rays,), jnp.int32),
        "cells": jnp.zeros((n_rays, K), jnp.int32),
        "dts": jnp.zeros((n_rays, K), jnp.float32),
    }


def march_while(tables, rp, carry, meta, opts, cap):
    """march_pass as a device-side while_loop: advance until every ray is
    done (left volume / saturated / slots full) or `cap` segments elapsed.

    One dispatch replaces the host-driven pass ladder's per-pass round trips
    (measured ~28-53 ms RTT each through the axon tunnel); the loop exits the
    moment the whole bucket is dead, so a short-lived bucket never pays the
    full segment budget in lockstep.
    """
    sigma_tab = tables["sigma"]
    o, dn, safe_dn, delta_scale, _, tmax, _ = rp
    K = carry["cells"].shape[1]
    iota_k = jnp.arange(K, dtype=jnp.int32)[None, :]

    def alive(c):
        return (
            (c["t"] <= tmax) & (c["light"] > opts.stop_thresh) & (c["count"] < K)
        )

    def cond(state):
        i, c, any_alive = state
        return (i < cap) & any_alive

    def body(state):
        i, c, _ = state
        t, light, count = c["t"], c["light"], c["count"]
        active = alive(c)
        pos = jnp.where(
            active[..., None],
            jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7),
            0.0,
        )
        cell, corner, size = _locate(tables, meta, pos)
        sigma = jnp.maximum(sigma_tab[cell], 0.0)

        # safe_dn, not dn: zero components substitute +1e-9, and (dn > 0)
        # would pick the near plane for them — exactly-axis-aligned rays
        # (NDC center rays) would crawl at step_size (renderer.py note).
        far_planes = corner + (safe_dn > 0) * size[..., None]
        t_exit = jnp.min((far_planes - pos) / safe_dn, axis=-1)
        delta_t = jnp.maximum(t_exit, 0.0) + opts.step_size

        keep = (sigma > 0.0) & (sigma >= opts.sigma_thresh)
        att = jnp.where(keep, jnp.exp(-delta_t * delta_scale * sigma), 1.0)
        push = active & keep
        oh = (iota_k == count[:, None]) & push[:, None]
        nc = {
            "t": jnp.where(active, t + delta_t, t),
            "light": jnp.where(active, light * att, light),
            "count": count + push.astype(jnp.int32),
            "cells": jnp.where(oh, cell[:, None], c["cells"]),
            "dts": jnp.where(oh, (delta_t * delta_scale)[:, None], c["dts"]),
        }
        return i + 1, nc, jnp.any(alive(nc))

    _, carry, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), carry, jnp.any(alive(carry)))
    )
    return carry


def alive_mask(rp, carry, opts, K):
    tmax = rp[5]
    return (
        (carry["t"] <= tmax)
        & (carry["light"] > max(opts.stop_thresh, 1e-4))
        & (carry["count"] < K)
    )


def overflow_mask(rp, carry, opts, K):
    """Rays that filled all K contributor slots while still inside the
    volume and unsaturated: their composite would show background through
    unmarched geometry. Dense volumetric trees (little empty space) need
    far more slots than surface-shell trees — drivers regrow K on this."""
    tmax = rp[5]
    return (
        (carry["t"] <= tmax)
        & (carry["light"] > max(opts.stop_thresh, 1e-4))
        & (carry["count"] >= K)
    )


def estimate_contrib_slots(tree, sigma_thresh=0.0, floor=64, cap=2048):
    """Size the contributor-slot count K from tree statistics up front.

    Sticky regrowth (render_chunk) is correct but pays one full re-march per
    doubling — a dense volumetric tree walked log2(2048/64)=5 re-renders
    before settling (VERDICT r3). A ray stops filling slots when it leaves
    the volume OR saturates (alive_mask: light <= max(stop_thresh, 1e-4)),
    so the bound is the number of occupied cells along a line UNTIL the
    cumulative optical depth reaches -log(1e-4): occupancy alone wildly
    overestimates opaque scenes (a dense extracted tree saturates in tens
    of cells; counting its whole column said 2048 and OOMed the optimizer).
    Estimated per axis-aligned column at the leaf grid (centers binned at
    2^max_depth, depth-ordered cumsum of sigma * world cell size), max over
    the three axes, x sqrt(3) for diagonals; power-of-two rounding keeps
    the jit shape set tiny, and regrowth stays as the backstop.
    """
    leaves = tree._leaf_nodes()
    if leaves.shape[0] == 0:
        return floor
    sigma = tree.data[
        leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3], -1
    ].astype(np.float64)
    keep = sigma > max(float(sigma_thresh), 0.0)
    if not keep.any():
        return floor
    # Finest cell side is (1/N)**(max_depth+1) (n3tree._cell_size), so the
    # grid that gives every max-depth leaf a unique bin is N**(max_depth+1);
    # binning at N**max_depth merged 2x2 lateral columns and quadrupled
    # per-column counts (ADVICE r4).
    reso = int(tree.N) ** (int(tree.max_depth) + 1)
    corner = tree._cell_corner(leaves[keep])
    size = tree._cell_size(leaves[keep]).astype(np.float64)
    sigma = np.maximum(sigma[keep], 0.0)
    ctr = np.clip(
        ((corner + 0.5 * size[:, None]) * reso).astype(np.int64), 0, reso - 1
    )
    # World length of a cell crossing: tree fraction / invradius (per-axis
    # scalar; exactness doesn't matter, the saturation cap has headroom).
    scale = float(np.max(1.0 / np.asarray(tree.invradius, np.float64)))
    od_cap = -np.log(1e-4)  # alive_mask's hard light floor
    m = 0
    for axis in range(3):
        a, b = (axis + 1) % 3, (axis + 2) % 3
        col = ctr[:, a] * reso + ctr[:, b]
        order = np.lexsort((ctr[:, axis], col))
        col_s = col[order]
        contrib = (sigma * size * scale)[order]
        starts_mask = np.r_[True, col_s[1:] != col_s[:-1]]
        seg_id = np.cumsum(starts_mask) - 1
        # A ray can traverse the column in either direction; an asymmetric
        # density profile saturates later when entered from the thin end, so
        # count the unsaturated prefix both ascending and descending and take
        # the max (ADVICE r4).
        for c in (contrib, contrib[::-1]):
            sid = seg_id if c is contrib else seg_id[::-1]
            # Per-direction exclusive cumsum rebased to each segment start.
            cum = np.cumsum(c)
            excl = cum - c
            smask = np.r_[True, sid[1:] != sid[:-1]]
            base = excl[np.nonzero(smask)[0]][np.cumsum(smask) - 1]
            within = excl - base < od_cap
            counts = np.bincount(sid, weights=within)
            m = max(m, int(counts.max()))
    est = int(np.ceil(np.sqrt(3.0) * m))
    k = max(floor, K_STRIP)
    while k < min(est, cap):
        k *= 2
    return min(k, cap)


def shade(data, cells, dts, count, basis, fmt, basis_dim, bg):
    """Full-K differentiable shading of contributor slots.

    Exact compositing over the slotted cells (skipped cells contributed
    neither color nor attenuation by construction). Returns rgb [R, C].
    """
    K = cells.shape[1]
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < count[:, None]
    cells = jnp.where(valid, cells, 0)
    rows = data[cells]  # [R, K, D] — the one big-table gather
    sigma = jnp.maximum(rows[..., -1], 0.0) * valid
    att = jnp.exp(-dts * sigma)
    cp = jnp.cumprod(att, axis=1)
    t_excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
    w = t_excl * (1.0 - att)
    n_channels = (data.shape[-1] - 1) // basis_dim
    coeffs = rows[..., :-1].reshape(rows.shape[:2] + (n_channels, basis_dim))
    raw = jnp.einsum("rkcb,rb->rkc", coeffs, basis, precision="highest")
    rgb = jax.nn.sigmoid(raw) if fmt in ("SH", "SG") else raw
    return jnp.sum(w[..., None] * rgb, axis=1) + cp[:, -1:] * bg


def shade_strip(data, cells_s, dts_s, valid_s, basis, light, acc, fmt, basis_dim):
    """One K_STRIP-slot shading step with carried (light, acc)."""
    cells_s = jnp.where(valid_s, cells_s, 0)
    rows = data[cells_s]
    sigma = jnp.maximum(rows[..., -1], 0.0) * valid_s
    att = jnp.exp(-dts_s * sigma)
    cp = jnp.cumprod(att, axis=1)
    t_excl = light[:, None] * jnp.concatenate(
        [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1
    )
    w = t_excl * (1.0 - att)
    n_channels = (data.shape[-1] - 1) // basis_dim
    coeffs = rows[..., :-1].reshape(rows.shape[:2] + (n_channels, basis_dim))
    raw = jnp.einsum("rkcb,rb->rkc", coeffs, basis, precision="highest")
    rgb = jax.nn.sigmoid(raw) if fmt in ("SH", "SG") else raw
    return light * cp[:, -1], acc + jnp.sum(w[..., None] * rgb, axis=1)


class DeferredRenderer:
    """Pass/compaction driver around march_while + strip shading (eval path).

    Holds jit caches keyed on (rows, segs) bucket shapes so repeated frames
    reuse compiles. The differentiable training path is `shade` called
    directly (see octree/optimize.py).
    """

    def __init__(self, arrays, fmt, basis_dim, opts, K=64, min_bucket=2048):
        self.tables, self.meta = split_arrays(arrays)
        self.fmt = fmt
        self.basis_dim = basis_dim
        self.opts = opts
        assert K % K_STRIP == 0, f"K must be a multiple of {K_STRIP}"
        self.K = K
        self.min_bucket = min_bucket
        self._build_jits()

    def _build_jits(self):
        opts = self.opts
        self._march = jax.jit(
            functools.partial(march_while, meta=self.meta, opts=opts),
            static_argnames=("cap",),
        )
        self._alive = jax.jit(functools.partial(alive_mask, opts=opts, K=self.K))

        def alive_over(rp, carry):
            return (
                alive_mask(rp, carry, opts=opts, K=self.K),
                jnp.any(overflow_mask(rp, carry, opts=opts, K=self.K)),
            )

        self._alive_over = jax.jit(alive_over)
        self._take = jax.jit(lambda tree, sel: jax.tree.map(lambda x: x[sel], tree))
        self._stash = jax.jit(
            lambda dst, src, rows: jax.tree.map(
                lambda d, s: d.at[rows].set(s), dst, src
            )
        )
        self._strip = jax.jit(
            functools.partial(shade_strip, fmt=self.fmt, basis_dim=self.basis_dim)
        )

    def _prep(self, origins, dirs):
        return _prep_rays(
            self.tables, jnp.asarray(origins), jnp.asarray(dirs), self.fmt, self.basis_dim
        )

    def render_chunk(self, origins, dirs, pass_schedule=(48, 192)):
        """Render one chunk of rays [R, 3] -> colors [R, C] (numpy).

        Each pass is ONE device dispatch: a while_loop march capped at the
        schedule value (the last value repeats until the segment budget runs
        out) that exits early when the whole bucket is dead. Between passes:
        one host alive-sync + factor-4 ray compaction. The (bucket, cap)
        shape space is deliberately TINY — a factor-4 bucket ladder and a
        static cap schedule — because every new shape is a fresh remote XLA
        compile (~15-30 s through the axon tunnel), which round-1's
        power-of-two x remaining-budget ladder paid on almost every frame.
        """
        n = origins.shape[0]
        rp = self._prep(origins, dirs)
        basis = rp[6]
        carry = init_carry(rp, n, self.K)
        # Device-side buffers holding finished rays' slots in original order.
        done = {
            "cells": jnp.zeros((n, self.K), jnp.int32),
            "dts": jnp.zeros((n, self.K), jnp.float32),
            "count": jnp.zeros((n,), jnp.int32),
        }
        mapping = np.arange(n)
        cur_rp = rp
        schedule = list(pass_schedule)
        seg_budget = self.opts.max_segments
        pass_i = 0
        bucket = n
        while seg_budget > 0:
            segs = schedule[min(pass_i, len(schedule) - 1)]
            segs = min(segs, max(seg_budget, 1))
            seg_budget -= segs
            pass_i += 1
            carry = self._march(self.tables, cur_rp, carry, cap=segs)
            alive_d, over_d = self._alive_over(cur_rp, carry)
            alive = np.asarray(alive_d)
            if bool(over_d):
                # Slot overflow: some ray filled all K contributor slots
                # while still inside unsaturated volume — compositing now
                # would show background through unmarched geometry (dense
                # volumetric trees need far more slots than surface shells).
                # Sticky-regrow K and redo the chunk exactly.
                if self.K >= 2048:
                    import warnings

                    warnings.warn(
                        f"march contributor slots clipped at K={self.K}; "
                        "rendering with truncated geometry"
                    )
                else:
                    self.K *= 2
                    self._build_jits()
                    return self.render_chunk(origins, dirs, pass_schedule)
            n_alive = int(alive.sum())
            if n_alive == 0:
                break
            new_bucket = bucket
            while n_alive * 4 <= new_bucket and new_bucket // 4 >= self.min_bucket:
                new_bucket //= 4
            if new_bucket < bucket:
                bucket = new_bucket  # ladder guarantees bucket >= n_alive
                keep = np.nonzero(alive)[0]
                retire = np.nonzero(~alive)[0]
                done = self._stash(
                    done,
                    self._take(
                        {k: carry[k] for k in ("cells", "dts", "count")},
                        jnp.asarray(retire),
                    ),
                    jnp.asarray(mapping[retire]),
                )
                pad = bucket - keep.size
                sel = np.concatenate([keep, np.repeat(keep[:1], pad)])
                sel_dev = jnp.asarray(sel)
                carry = self._take(carry, sel_dev)
                cur_rp = self._take(cur_rp, sel_dev)
                mapping = mapping[sel]
        # Stash whatever is left (duplicated padding rows collapse fine).
        done = self._stash(
            done,
            {k: carry[k] for k in ("cells", "dts", "count")},
            jnp.asarray(mapping),
        )
        return self._shade_done(done, basis)

    def _shade_done(self, done, basis):
        counts = np.asarray(done["count"])
        max_count = int(counts.max()) if counts.size else 0
        n = counts.shape[0]
        light = jnp.ones((n,), jnp.float32)
        n_channels = (self.tables["data"].shape[-1] - 1) // self.basis_dim
        acc = jnp.zeros((n, n_channels), jnp.float32)
        iota = jnp.arange(K_STRIP, dtype=jnp.int32)[None, :]
        for s0 in range(0, max(max_count, 1), K_STRIP):
            valid = (iota + s0) < done["count"][:, None]
            light, acc = self._strip(
                self.tables["data"],
                jax.lax.dynamic_slice_in_dim(done["cells"], s0, K_STRIP, 1),
                jax.lax.dynamic_slice_in_dim(done["dts"], s0, K_STRIP, 1),
                valid,
                basis,
                light,
                acc,
            )
        out = acc + light[:, None] * self.opts.background_brightness
        return np.asarray(out)
