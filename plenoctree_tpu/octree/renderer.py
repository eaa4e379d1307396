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


MAX_ACCEL_RESO = 512  # dense pointer grid cap: 512^3 u32 = 512 MB HBM


def build_accel_grid(tree):
    """Dense leaf-pointer grid: accel[vx, vy, vz] = (leaf_cell << 4) | depth.

    XLA gathers are latency-bound (~1 row per ~7ns regardless of width), so
    the 7-8 chained child-pointer gathers of a per-segment tree descent
    dominate rendering. This grid collapses the descent to ONE u32 gather:
    the containing leaf's flat cell index plus its node depth, from which the
    leaf cube is recomputed arithmetically (corner = floor(pos/s)*s,
    s = 2^-(depth+1)).

    Returns (grid [reso^3] uint32, reso), or None when the tree is too deep.
    """
    if tree.max_depth + 1 > int(np.log2(MAX_ACCEL_RESO)):
        return None
    reso = 2 ** (tree.max_depth + 1)
    arr = (np.arange(reso, dtype=np.float64) + 0.5) / reso
    # Query in blocks to bound peak memory at high reso.
    grid = np.empty(reso * reso * reso, np.uint32)
    block = max(1, (2**22) // (reso * reso))
    for x0 in range(0, reso, block):
        xs = arr[x0 : x0 + block]
        pts = np.stack(
            np.meshgrid(xs, arr, arr, indexing="ij"), axis=-1
        ).reshape(-1, 3)
        node, cell, depth = tree.query_points(pts.astype(np.float32), world=False)
        flat = (
            np.asarray(node) * 8
            + cell[:, 0] * 4
            + cell[:, 1] * 2
            + cell[:, 2]
        ).astype(np.uint32)
        grid[x0 * reso * reso : x0 * reso * reso + pts.shape[0]] = (
            flat << 4
        ) | np.asarray(depth).astype(np.uint32)
    return grid, reso


def tree_arrays(tree, accel=True):
    """Flatten an N3Tree into device arrays for rendering.

    Returns a dict pytree:
      child  [n*8]  int32 absolute child node id, -1 for leaf
      data   [n*8, data_dim] float32
      offset/invradius [3]
      extra_data (SG lambda/mu) or None
      accel  [reso^3] uint32 leaf-pointer grid (or None), accel_reso
    """
    n = tree.n_internal
    child_rel = tree.child[:n].reshape(n, -1).astype(np.int64)
    node_ids = np.arange(n, dtype=np.int64)[:, None]
    child_abs = np.where(child_rel == 0, -1, child_rel + node_ids)
    out = {
        "child": jnp.asarray(child_abs.reshape(-1).astype(np.int32)),
        "data": jnp.asarray(
            tree.data[:n].reshape(n * tree.N**3, tree.data_dim).astype(np.float32)
        ),
        "offset": jnp.asarray(tree.offset, jnp.float32),
        "invradius": jnp.asarray(tree.invradius, jnp.float32),
        "extra_data": None
        if tree.extra_data is None
        else jnp.asarray(tree.extra_data, jnp.float32),
        "accel": None,
        "accel_reso": 0,
    }
    if accel:
        built = build_accel_grid(tree)
        if built is not None:
            grid, reso = built
            out["accel"] = jnp.asarray(grid)
            out["accel_reso"] = reso
    return out


def write_back_data(tree, data):
    """Write optimized flat leaf data back into the host tree."""
    n = tree.n_internal
    tree.data[:n] = np.asarray(data).reshape(n, tree.N, tree.N, tree.N, tree.data_dim)
    return tree


def _descend(child, pos, depth_limit):
    """Branch-free fixed-depth descent. pos in [0,1)^3.

    Returns (cell_flat_index, cube_corner, cube_size) of the containing leaf.
    """
    node = jnp.zeros(pos.shape[:-1], jnp.int32)
    corner = jnp.zeros_like(pos)
    size = jnp.ones(pos.shape[:-1], pos.dtype)
    local = pos
    cell = jnp.zeros(pos.shape[:-1], jnp.int32)
    done = jnp.zeros(pos.shape[:-1], bool)
    for _ in range(depth_limit + 1):
        idx = jnp.clip((local * 2).astype(jnp.int32), 0, 1)
        flat = node * 8 + idx[..., 0] * 4 + idx[..., 1] * 2 + idx[..., 2]
        nxt = child[flat]
        is_leaf = nxt < 0
        newly_done = is_leaf & ~done
        cell = jnp.where(newly_done, flat, cell)
        corner = jnp.where(
            (~done)[..., None], corner + idx * (size[..., None] * 0.5), corner
        )
        size = jnp.where(done, size, size * 0.5)
        node = jnp.where(is_leaf | done, node, nxt)
        local = jnp.where((is_leaf | done)[..., None], local, local * 2 - idx)
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


def _lookup_accel(accel, reso, pos):
    """One-gather leaf lookup via the dense pointer grid."""
    v = jnp.clip((pos * reso).astype(jnp.int32), 0, reso - 1)
    word = accel[(v[..., 0] * reso + v[..., 1]) * reso + v[..., 2]]
    cell = (word >> 4).astype(jnp.int32)
    depth = (word & 15).astype(jnp.int32)
    size = jnp.exp2(-(depth + 1).astype(pos.dtype))
    corner = jnp.floor(pos / size[..., None]) * size[..., None]
    return cell, corner, size


def _make_step(arrays, rp, fmt, basis_dim, depth_limit, opts):
    """One leaf segment: carry (t, light, accum) -> carry."""
    child = arrays["child"]
    data = arrays["data"]
    accel = arrays.get("accel")
    o, dn, safe_dn, delta_scale, _, tmax, basis = rp
    n_channels = (data.shape[-1] - 1) // basis_dim

    def step(carry, _):
        t, light, accum = carry
        pos = jnp.clip(o + t[..., None] * dn, 0.0, 1.0 - 1e-7)
        if accel is not None:
            cell, corner, size = _lookup_accel(accel, arrays["accel_reso"], pos)
        else:
            cell, corner, size = _descend(child, pos, depth_limit)

        # Distance to the leaf cube's exit plane along the ray.
        far_planes = corner + (dn > 0) * size[..., None]
        t_exit = jnp.min((far_planes - pos) / safe_dn, axis=-1)
        delta_t = jnp.maximum(t_exit, 0.0) + opts.step_size

        active = (t <= tmax) & (light > opts.stop_thresh)
        vals = data[cell]  # [R, data_dim]
        sigma = jnp.maximum(vals[..., -1], 0.0)
        sigma = jnp.where(sigma >= opts.sigma_thresh, sigma, 0.0)
        att = jnp.exp(-delta_t * delta_scale * sigma)
        weight = jnp.where(active, light * (1.0 - att), 0.0)

        coeffs = vals[..., :-1].reshape(vals.shape[:-1] + (n_channels, basis_dim))
        raw = jnp.einsum("...ck,...k->...c", coeffs, basis)
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


def render_pass(arrays, origins, dirs, carry, fmt, basis_dim, depth_limit, opts, n_segments):
    """One multi-pass chunk: advance every ray by `n_segments` leaf segments.

    carry: (t, light, accum) or None to initialize. Returns (carry, alive)
    where alive is a per-ray bool mask (still marching).
    """
    rp = _prep_rays(arrays, origins, dirs, fmt, basis_dim)
    step, n_channels = _make_step(arrays, rp, fmt, basis_dim, depth_limit, opts)
    if carry is None:
        carry = (
            rp[4],
            jnp.ones_like(rp[4]),
            jnp.zeros(origins.shape[:-1] + (n_channels,), jnp.float32),
        )
    carry, _ = jax.lax.scan(step, carry, None, length=n_segments)
    t, light, _ = carry
    stop = max(opts.stop_thresh, 1e-4)
    alive = (t <= rp[5]) & (light > stop)
    return carry, alive


def finalize_pass(carry, opts):
    _, light, accum = carry
    return accum + light[..., None] * opts.background_brightness


class VolumeRenderer:
    """Convenience wrapper mirroring svox.VolumeRenderer's API surface.

    Holds the host tree + device arrays; `render_persp(c2w, ...)` renders a
    full pinhole image with pass-level early termination. The differentiable
    path is `render_rays` with a traced `data` (see octree/optimize.py).
    """

    def __init__(
        self,
        tree,
        step_size=1e-4,
        ndc=None,
        background_brightness=1.0,
        segs_per_pass=48,
        max_segments=None,
    ):
        self.tree = tree
        self.arrays = tree_arrays(tree)
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
        self._pass_fns = {}

    def _get_pass_fn(self, fast):
        if fast not in self._pass_fns:
            opts = self.opts
            if fast:
                opts = replace(opts, sigma_thresh=1e-2, stop_thresh=1e-2)
            self._pass_fns[fast] = (
                jax.jit(
                    functools.partial(
                        render_pass,
                        fmt=self.fmt,
                        basis_dim=self.basis_dim,
                        depth_limit=self.depth_limit,
                        opts=opts,
                        n_segments=self.segs_per_pass,
                    )
                ),
                opts,
            )
        return self._pass_fns[fast]

    def render_rays_early_stop(self, origins, dirs, fast=False):
        """Render [R, 3] rays with pass-level early termination + compaction.

        Between passes, finished rays (left the volume / saturated opacity)
        are compacted out on the host: the alive set shrinks to the next
        power-of-two bucket, so later passes march only the surviving rays
        (one compile per bucket size, cached). Typical scenes finish most
        background rays in the first pass.
        """
        pass_fn, opts = self._get_pass_fn(fast)
        n = origins.shape[0]
        origins = np.asarray(origins, np.float32)
        dirs = np.asarray(dirs, np.float32)
        out = np.zeros((n, 3), np.float32)
        mapping = np.arange(n)  # current row -> original ray index
        cur_o, cur_d = origins, dirs
        carry = None
        max_passes = max(1, self.opts.max_segments // self.segs_per_pass + 1)
        min_bucket = 2048
        for _ in range(max_passes):
            carry, alive = pass_fn(
                self.arrays, jnp.asarray(cur_o), jnp.asarray(cur_d), carry
            )
            alive_np = np.asarray(alive)
            n_alive = int(alive_np.sum())
            if n_alive == 0:
                break
            # Shrink to the next power-of-two bucket when under half full.
            cur_n = cur_o.shape[0]
            if n_alive <= cur_n // 2 and cur_n > min_bucket:
                bucket = max(min_bucket, 1 << int(np.ceil(np.log2(n_alive))))
                keep = np.nonzero(alive_np)[0]
                # Retire finished rays' colors now.
                done = np.nonzero(~alive_np)[0]
                colors = np.asarray(finalize_pass(carry, opts))
                out[mapping[done]] = colors[done]
                # Pad the alive set to the bucket with repeats of row 0.
                pad = bucket - keep.size
                sel = np.concatenate([keep, np.repeat(keep[:1], pad)])
                carry = tuple(np.asarray(c)[sel] for c in carry)
                carry = tuple(jnp.asarray(c) for c in carry)
                mapping = mapping[sel]
                cur_o, cur_d = cur_o[sel], cur_d[sel]
        colors = np.asarray(finalize_pass(carry, opts))
        # Padded duplicate rows map to the same original ray (same color).
        out[mapping] = colors
        return out

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
    return int(3 * 2**tree.max_depth)


def make_ndc_config(width, height, focal):
    return {"width": width, "height": height, "focal": focal}
