"""Differentiable tile-compositing octree optimization (TPU-first).

Reference capability: svox's CUDA `_VolumeRenderFunction` backward
(octree/optimization.py:174-226) — direct SGD/Adam on leaf data through a
differentiable volume renderer. The march-based path (octree/optimize.py)
is exact but gather-latency-bound on TPU; this module instead
differentiates the dense tile-compositing renderer (tile_render.py), so
optimization runs on the same contiguous-DMA + VPU/MXU pipeline as serving.

The backward is one Pallas kernel, structurally the forward replayed in the
SAME front-to-back chunk order. The enabling identity: for hit i on a ray,

    dL/d(sdt_i) = g.rgb_i * light_i * exp(-sdt_i) - S_i,
    S_i = sum_{j after i} g.rgb_j * contrib_j + g_light * light_total,

and the suffix S_i = T_all - prefix_i, where T_all = sum_c g_c * acc_c +
g_light * light_total comes FREE from the forward outputs, and the
within-chunk prefix uses the same [rows, rows] precedence-mask matmul as
the forward's occlusion ordering. So the backward needs no reverse
traversal and no stored per-chunk state — just a second replay with ~2 extra
MXU matmuls per chunk, accumulating row gradients into an HBM buffer by
read-modify-write DMA (the Pallas grid is sequential, so this is race-free).

Gradients flow to leaf data through the soa assembly gather
(leaf_dataT[:, col_leaf]), whose JAX transpose is exactly the
instance->leaf segment-sum; replicas of one leaf sum automatically.

The optimizer runs the EXACT mode (sigma/stop thresholds 0, no early exit)
and builds its index with keep_all=True so zero-sigma leaves can revive
under gradient — matching svox, which renders current data every step.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plenoctree_tpu.octree import tile_render as tr


def _tile_bwd_kernel(
    meta_ref,  # (1, 1, 4) SMEM: [n_pieces, 0, 0, 0]
    chunk_c0_ref,  # (1, 1, ccap) SMEM
    chunk_lo_ref,  # (1, 1, ccap) SMEM
    chunk_hi_ref,  # (1, 1, ccap) SMEM
    chunk_mask_ref,  # (1, 1, ccap) SMEM — quad-group masks (unused here:
    # the backward replays all groups; skipped (group, chunk) pairs have
    # no hits, so their grads/prefixes are zero either way)
    o_ref,  # (1, RAYS, 4)
    invd_ref,  # (1, RAYS, 4)
    aux_ref,  # (1, RAYS, 4)
    mdir_ref,  # (1, 1, 4)
    basis_ref,  # (1, RAYS, bd)
    soa_ref,  # blocked [3*npad/quantum, fields, quantum] ANY
    out_ref,  # (1, RAYS, 8) — FORWARD outputs (acc + light)
    g_ref,  # (1, RAYS, 8) — cotangents (g_acc + g_light)
    gsoa_in_ref,  # blocked grad buffer, zero-init (aliased)
    gsoa_ref,  # blocked grad buffer — output alias of gsoa_in
    buf,  # VMEM (2, fields, runrows)
    state,  # VMEM (RAYS, 8): [cum, pref, pad] — scratch, zeroed per tile
    gacc,  # VMEM (fields, runrows): chunk-local grad accumulator
    gtmp,  # VMEM (fields, runrows): RMW staging
    sem,  # DMA((3, G))
    *,
    fmt,
    basis_dim,
    n_channels,
    sigma_row,
    rays,
    runrows,
    quantum,
    step_eps,
):
    n_pieces = meta_ref[0, 0, 0]
    G = runrows // quantum
    n_chunks = (n_pieces + G - 1) // G
    basis = basis_ref[0]  # [RAYS, bd]
    dscale = aux_ref[0, :, 0:1]
    tmin = aux_ref[0, :, 1:2]
    tmax = aux_ref[0, :, 2:3]
    nc = n_channels

    # T_all per ray from forward outputs and cotangents.
    gout = g_ref[0]  # [RAYS, 8]
    fout = out_ref[0]
    t_all = jnp.sum(
        gout[:, : nc + 1] * fout[:, : nc + 1], axis=1, keepdims=True
    )  # [RAYS, 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, runrows), 1)
    sublane = lane % quantum

    def piece_dma(p, slot, g):
        # Blocked soa [n_blocks, fields, quantum]: one contiguous burst.
        blk = chunk_c0_ref[0, 0, p] // quantum
        return pltpu.make_async_copy(
            soa_ref.at[blk],
            buf.at[slot, :, pl.ds(g * quantum, quantum)],
            sem.at[slot, g],
        )

    def chunk_start(t, slot):
        for g in range(G):

            @pl.when(t * G + g < n_pieces)
            def _(g=g):
                piece_dma(t * G + g, slot, g).start()

    def chunk_wait(t, slot):
        for g in range(G):

            @pl.when(t * G + g < n_pieces)
            def _(g=g):
                piece_dma(t * G + g, slot, g).wait()

    def lane_meta(t):
        rowid = jnp.zeros((1, runrows), jnp.int32)
        lo_v = jnp.zeros((1, runrows), jnp.int32)
        hi_v = jnp.zeros((1, runrows), jnp.int32)
        for g in range(G):
            in_g = (lane >= g * quantum) & (lane < (g + 1) * quantum)
            p = jnp.minimum(t * G + g, n_pieces - 1)
            valid_p = t * G + g < n_pieces
            rowid = jnp.where(in_g, chunk_c0_ref[0, 0, p] + sublane, rowid)
            lo_v = jnp.where(in_g & valid_p, chunk_lo_ref[0, 0, p], lo_v)
            hi_v = jnp.where(in_g & valid_p, chunk_hi_ref[0, 0, p], hi_v)
        return rowid, lo_v, hi_v

    buf[...] = jnp.zeros(buf.shape, jnp.float32)
    # Per-ray running state (col 0 = cum optical depth, col 1 = prefix of
    # e = sum_c g_c*rgb_c*contrib) lives in VMEM scratch so quad-group
    # compute can be skipped under pl.when (mirrors the forward kernel).
    state[...] = jnp.zeros(state.shape, jnp.float32)
    gsz = rays // 4
    ones_col = jnp.ones((runrows, 1), jnp.float32)
    # Loop-invariant [R, R] iotas for the precedence build.
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 1)
    ).astype(jnp.float32)
    rid_lt_cid = jax.lax.broadcasted_iota(
        jnp.int32, (runrows, runrows), 0
    ) < jax.lax.broadcasted_iota(jnp.int32, (runrows, runrows), 1)

    @pl.when(n_chunks > 0)
    def _():
        chunk_start(0, 0)

    def cond(carry):
        return carry < n_chunks

    def body(t):
        @pl.when(t + 1 < n_chunks)
        def _():
            chunk_start(t + 1, (t + 1) % 2)

        chunk_wait(t, t % 2)
        f = buf[t % 2]
        rowid, lo_v, hi_v = lane_meta(t)
        live = (rowid >= lo_v) & (rowid < hi_v)

        cmask = jnp.int32(0)
        for g in range(G):
            p = jnp.minimum(t * G + g, n_pieces - 1)
            valid_p = t * G + g < n_pieces
            cmask = cmask | jnp.where(valid_p, chunk_mask_ref[0, 0, p], 0)

        # --- shared per-chunk work (identical math to _tile_kernel) ------
        sigma = jnp.maximum(f[sigma_row : sigma_row + 1, :], 0.0)
        sig_gate = (sigma > 0.0).astype(jnp.float32)
        key = (
            0.5
            * (
                (f[0:1, :] + f[3:4, :]) * mdir_ref[0, 0, 0]
                + (f[1:2, :] + f[4:5, :]) * mdir_ref[0, 0, 1]
                + (f[2:3, :] + f[5:6, :]) * mdir_ref[0, 0, 2]
            )
        )
        key_col = jax.lax.dot_general(
            eye,
            key,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # HIGHEST is load-bearing (see _tile_kernel): DEFAULT truncates to
        # bf16 on the MXU and `before` stops being a strict total order for
        # keys within bf16 eps (adjacent deep-tree cells are).
        before = ((key_col < key) | ((key_col == key) & rid_lt_cid)).astype(
            jnp.float32
        )

        gacc[...] = jnp.zeros(gacc.shape, jnp.float32)

        for g in range(4):
            sl = slice(g * gsz, (g + 1) * gsz)

            @pl.when((cmask >> g) % 2 == 1)
            def _(sl=sl):
                # Forward replay for this quad group, [gsz, R].
                tn = None
                tf = None
                for a in range(3):
                    t1 = (f[a : a + 1, :] - o_ref[0, sl, a : a + 1]) * invd_ref[
                        0, sl, a : a + 1
                    ]
                    t2 = (
                        f[3 + a : 4 + a, :] - o_ref[0, sl, a : a + 1]
                    ) * invd_ref[0, sl, a : a + 1]
                    tn_a = jnp.minimum(t1, t2)
                    tf_a = jnp.maximum(t1, t2)
                    tn = tn_a if tn is None else jnp.maximum(tn, tn_a)
                    tf = tf_a if tf is None else jnp.minimum(tf, tf_a)
                entry = jnp.maximum(tn, tmin[sl])
                hit = (tf > entry) & (entry <= tmax[sl]) & live
                dtv = jnp.where(
                    hit, (tf - entry + step_eps) * dscale[sl], 0.0
                )
                sdt = sigma * dtv
                occ = state[sl, 0:1] + jax.lax.dot(
                    sdt, before, preferred_element_type=jnp.float32
                )
                light = jnp.exp(-occ)
                esdt = jnp.exp(-sdt)
                contrib = light * (1.0 - esdt)

                basis_g = basis[sl]
                gout_g = gout[sl]
                rgbs = []
                for c in range(nc):
                    coef_c = f[6 + c * basis_dim : 6 + (c + 1) * basis_dim, :]
                    raw_c = jax.lax.dot(
                        basis_g, coef_c, preferred_element_type=jnp.float32
                    )
                    rgbs.append(
                        0.5 * jnp.tanh(0.5 * raw_c) + 0.5
                        if fmt in ("SH", "SG")
                        else raw_c
                    )

                # Adjoint for this group.
                gsum = None
                for c in range(nc):
                    term = gout_g[:, c : c + 1] * rgbs[c]
                    gsum = term if gsum is None else gsum + term
                e = gsum * contrib
                p_before = state[sl, 1:2] + jax.lax.dot(
                    e, before, preferred_element_type=jnp.float32
                )
                suffix = t_all[sl] - p_before - e
                dsdt = jnp.where(hit, gsum * light * esdt - suffix, 0.0)

                # Accumulate chunk-local grads into gacc.
                for c in range(nc):
                    if fmt in ("SH", "SG"):
                        draw_c = (
                            gout_g[:, c : c + 1]
                            * contrib
                            * rgbs[c]
                            * (1.0 - rgbs[c])
                        )
                    else:
                        draw_c = gout_g[:, c : c + 1] * contrib
                    r0 = 6 + c * basis_dim
                    gacc[r0 : r0 + basis_dim, :] = gacc[
                        r0 : r0 + basis_dim, :
                    ] + jax.lax.dot_general(
                        basis_g,
                        jnp.where(hit, draw_c, 0.0),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                # sigma grad (relu-gated), summed over group rays via MXU.
                dsig = (
                    jax.lax.dot_general(
                        jnp.ones((1, gsz), jnp.float32),
                        dsdt * dtv,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * sig_gate
                )
                gacc[sigma_row : sigma_row + 1, :] = (
                    gacc[sigma_row : sigma_row + 1, :] + dsig
                )

                state[sl, 0:1] = state[sl, 0:1] + jax.lax.dot(
                    sdt, ones_col, preferred_element_type=jnp.float32
                )
                state[sl, 1:2] = state[sl, 1:2] + jax.lax.dot(
                    e, ones_col, preferred_element_type=jnp.float32
                )

        # Per-piece RMW, strictly sequential: after run merging, duplicate
        # blocks within a chunk only arise at rare direction-flip
        # boundaries, and read-add-write per piece keeps those correct
        # (the g-th write lands before the g+1-th read).
        for g in range(G):

            @pl.when(t * G + g < n_pieces)
            def _(g=g):
                blk = chunk_c0_ref[0, 0, t * G + g] // quantum
                gdst = gsoa_ref.at[blk]
                gslc = gtmp.at[:, pl.ds(g * quantum, quantum)]
                # Dedicated semaphore row: rows 0-1 belong to the (possibly
                # in-flight) piece prefetches of the two ring slots.
                rd = pltpu.make_async_copy(gdst, gslc, sem.at[2, 0])
                rd.start()
                rd.wait()
                gtmp[:, g * quantum : (g + 1) * quantum] = (
                    gtmp[:, g * quantum : (g + 1) * quantum]
                    + gacc[:, g * quantum : (g + 1) * quantum]
                )
                wr = pltpu.make_async_copy(gslc, gdst, sem.at[2, 0])
                wr.start()
                wr.wait()

        return t + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


class TileOptimizer:
    """Differentiable full-frame renderer over a static tree topology.

    Exposes `loss_and_grad(leaf_dataT, c2w, gt)` — MSE over the image and
    d(loss)/d(leaf_dataT) — and `render(leaf_dataT, c2w)` for validation.
    leaf_dataT is [data_dim, n_kept] (transposed so the per-step soa
    assembly is one gather along the column axis, no transpose).
    """

    def __init__(
        self,
        tree,
        step_size=1e-4,
        background_brightness=1.0,
        grid_c=64,
        fine_c2=None,
        runrows=tr.RUNROWS,
        rcap=256,
        ccap=None,
        nbuf=4,
        quantum=128,
        tile=tr.TILE,
        interpret=None,
    ):
        # Exact mode + keep-all: svox parity (no thresholds during opt).
        self.r = tr.TileRenderer.__new__(tr.TileRenderer)
        r = self.r
        r.tree = tree
        r.opts = tr.RenderOptions(
            step_size=step_size,
            background_brightness=background_brightness,
            sigma_thresh=0.0,
            stop_thresh=0.0,
        )
        r.runrows = runrows
        r.use_bf16 = False  # gradients want full f32 forward
        interp = jax.default_backend() != "tpu" if interpret is None else interpret
        if not interp and quantum % 128 != 0:
            raise ValueError(
                f"quantum={quantum} unsupported on TPU hardware (Mosaic "
                "requires 128-aligned lane slices); use quantum=128."
            )
        r.index = tr.build_tile_index(
            tree, 0.0, grid_c, fine_c2, runrows, keep_all=True,
            quantum=quantum,
        )
        r.grid_c = grid_c
        r.fine_c2 = r.index["fine_c2"]
        r.rcap = rcap
        r.ccap = ccap or rcap * max(2, runrows // quantum)
        r.nbuf = nbuf
        r.quantum = quantum
        r.w1cap = None
        r.fmt = tree.data_format.format
        r.basis_dim = tree.data_format.basis_dim
        r.n_channels = (r.index["sigma_row"] - 6) // r.basis_dim
        r.offset = jnp.asarray(tree.offset, jnp.float32)
        r.invradius = jnp.asarray(tree.invradius, jnp.float32)
        r.extra_data = (
            None if tree.extra_data is None else jnp.asarray(tree.extra_data)
        )
        r.interpret = interp
        r.ndc = None  # svox parity: tile_opt serves pinhole scenes only
        r.output = "f32"
        r.tile = tile
        r.rays = tile * tile
        r._p2_cache = {}
        r._frame_cache = {}

        idx = r.index
        self.data_dim = int(idx["sigma_row"]) - 6 + 1
        self.n_kept = int(idx["n_kept"])
        self.col_leaf = jnp.asarray(idx["col_leaf"])
        # Static soa: geometry rows stay; data rows are overwritten per step.
        self.static_soa = idx["soa"]
        self._bwd_cache = {}
        self._loss_cache = {}

    # -- leaf data <-> tree ------------------------------------------------

    def initial_leaf_dataT(self):
        tree = self.r.tree
        leaves = tree._leaf_nodes()[np.asarray(self.r.index["keep_mask"])]
        data = tree.data[leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]]
        return jnp.asarray(np.ascontiguousarray(data.astype(np.float32).T))

    def write_back(self, tree, leaf_dataT):
        leaves = tree._leaf_nodes()[np.asarray(self.r.index["keep_mask"])]
        data = np.asarray(leaf_dataT).T
        tree.data[leaves[:, 0], leaves[:, 1], leaves[:, 2], leaves[:, 3]] = data

    # -- kernels -----------------------------------------------------------

    def _get_p2_bwd(self, n_tiles, ccap):
        """One-tile backward kernel, driven by a lax.scan over tiles.

        The accumulation buffer is the scan carry, aliased through the
        kernel (input_output_aliases on a single-invocation call) — grid
        steps of one pallas_call do NOT reliably see each other's writes
        to an aliased ANY buffer (interpret mode keeps per-step copies),
        so cross-tile accumulation lives in XLA instead.
        """
        key = (n_tiles, ccap)
        if key in self._bwd_cache:
            return self._bwd_cache[key]
        r = self.r
        RAYS = r.rays
        fields = int(self.static_soa.shape[1])
        kernel = functools.partial(
            _tile_bwd_kernel,
            fmt=r.fmt,
            basis_dim=r.basis_dim,
            n_channels=r.n_channels,
            sigma_row=int(r.index["sigma_row"]),
            rays=RAYS,
            runrows=r.runrows,
            quantum=r.quantum,
            step_eps=r.opts.step_size,
        )
        bd = r.basis_dim
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # meta (1,1,4)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_c0 (1,1,ccap)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_lo
                pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_hi
                pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_mask
                vspec,  # o
                vspec,  # invd
                vspec,  # aux
                vspec,  # mdir
                vspec,  # basis
                pl.BlockSpec(memory_space=pl.ANY),  # soa
                vspec,  # forward out
                vspec,  # cotangent
                pl.BlockSpec(memory_space=pl.ANY),  # grad carry (aliased)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(self.static_soa.shape, jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, fields, r.runrows), jnp.float32),
                pltpu.VMEM((RAYS, 8), jnp.float32),
                pltpu.VMEM((fields, r.runrows), jnp.float32),
                pltpu.VMEM((fields, r.runrows), jnp.float32),
                pltpu.SemaphoreType.DMA((3, max(2, r.runrows // r.quantum))),
            ],
            input_output_aliases={13: 0},
            interpret=r.interpret,
        )

        def run_bwd_all(p2_args, soa, out, g, gz):
            def body(gsoa, t):
                sl = lambda x: jax.lax.dynamic_slice(
                    x, (t,) + (0,) * (x.ndim - 1), (1,) + x.shape[1:]
                )
                args = [sl(a) for a in p2_args]
                gsoa = call(
                    *args[:10], soa, sl(out), sl(g), gsoa
                )
                return gsoa, None
            gsoa, _ = jax.lax.scan(body, gz, jnp.arange(n_tiles))
            return gsoa

        self._bwd_cache[key] = run_bwd_all
        return run_bwd_all

    # -- differentiable frame ---------------------------------------------

    def _loss_fn(self, height, width, fx):
        key = (height, width, float(fx))
        if key in self._loss_cache:
            return self._loss_cache[key]
        r = self.r
        if r.w1cap is None:
            r.w1cap = int(
                min(r.grid_c, np.ceil(np.sqrt(3) * r.tile / fx * r.grid_c) + 3)
            )
        rcap, w1cap, ccap = r.rcap, r.w1cap, r.ccap
        TILE = r.tile
        RAYS = r.rays
        hp = -(-height // TILE) * TILE
        wp = -(-width // TILE) * TILE
        n_tiles = (hp // TILE) * (wp // TILE)
        nc = r.n_channels
        tile_inputs = r.make_tile_inputs_fn(height, width, fx, rcap, w1cap, ccap)
        p2 = r._get_p2(n_tiles, ccap)
        p2b = self._get_p2_bwd(n_tiles, ccap)

        @jax.custom_vjp
        def run_tiles(soa, p2_args):
            return p2(*p2_args, soa)

        def run_fwd(soa, p2_args):
            out = p2(*p2_args, soa)
            return out, (soa, p2_args, out)

        def run_bwd(res, g):
            soa, p2_args, out = res
            gz = jnp.zeros_like(soa)
            gsoa = p2b(p2_args, soa, out, g, gz)
            zeros = jax.tree.map(
                lambda x: np.zeros(x.shape, jax.dtypes.float0)
                if not jnp.issubdtype(x.dtype, jnp.floating)
                else jnp.zeros_like(x),
                p2_args,
            )
            return gsoa, zeros

        run_tiles.defvjp(run_fwd, run_bwd)

        idx = r.index

        def assemble(leaf_dataT):
            # [D, n_kept] -> data rows of the blocked soa via one gather
            # (its AD transpose is the instance->leaf segment-sum) + a
            # block relayout.
            pad = jnp.zeros((self.data_dim, 1), leaf_dataT.dtype)
            dataT = jnp.concatenate([leaf_dataT, pad], axis=1)
            rows = dataT[:, self.col_leaf]  # [D, 3*npad]
            nb, _, q = self.static_soa.shape
            blocked = rows.reshape(self.data_dim, nb, q).transpose(1, 0, 2)
            return jax.lax.dynamic_update_slice(
                self.static_soa, blocked, (0, 6, 0)
            )

        def loss_fn(leaf_dataT, c2w, gt):
            p2_args, n_total, n_chunks, w1_over = tile_inputs(
                c2w, idx["csr"], idx["base"], r.extra_data, idx["blk_bbox"]
            )
            p2_args = jax.lax.stop_gradient(p2_args)
            soa = assemble(leaf_dataT)
            out = run_tiles(soa, p2_args)
            acc = out[:, :, :nc]
            light = out[:, :, nc]
            img = acc + light[..., None] * r.opts.background_brightness
            img = tr._untile(img, hp, wp, TILE)[:height, :width]
            # Reference clamps the render before the MSE
            # (octree/optimization.py:218-219); jnp.clip's AD zeroes
            # out-of-range pixel gradients the same way torch.clamp does.
            loss = jnp.mean((jnp.clip(img, 0.0, 1.0) - gt) ** 2)
            return loss, (
                img, jnp.max(n_total), jnp.max(n_chunks), jnp.max(w1_over)
            )

        vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

        def render(leaf_dataT, c2w):
            p2_args, n_total, n_chunks, w1_over = tile_inputs(
                c2w, idx["csr"], idx["base"], r.extra_data, idx["blk_bbox"]
            )
            soa = assemble(leaf_dataT)
            out = p2(*p2_args, soa)
            acc = out[:, :, :nc]
            light = out[:, :, nc]
            img = acc + light[..., None] * r.opts.background_brightness
            img = tr._untile(img, hp, wp, TILE)[:height, :width]
            return img, jnp.max(n_total), jnp.max(n_chunks), jnp.max(w1_over)

        fns = (vg, jax.jit(render))
        self._loss_cache[key] = fns
        return fns

    def loss_and_grad(self, leaf_dataT, c2w, gt, height, width, fx):
        """Returns ((loss, (img, n_max, nc_max, w1_over)), grad_leaf_dataT)."""
        vg, _ = self._loss_fn(height, width, fx)
        return vg(
            leaf_dataT, jnp.asarray(np.asarray(c2w, np.float32)), jnp.asarray(gt)
        )

    def render(self, leaf_dataT, c2w, height, width, fx):
        _, render = self._loss_fn(height, width, fx)
        img, n_max, nc_max, w1_over = render(
            leaf_dataT, jnp.asarray(np.asarray(c2w, np.float32))
        )
        return np.asarray(img), int(n_max), int(nc_max), int(w1_over)


def optimize_tree_tiles(
    tree,
    train_c2w,
    train_gt,
    test_c2w,
    test_gt,
    focal,
    cfg,
    num_epochs=80,
    lr=1e7,
    use_sgd=True,
    sgd_momentum=0.0,
    val_interval=2,
    continue_on_decrease=False,
    grid_c=64,
):
    """Tile-kernel octree fine-tuning; returns (best_tree_or_None, best_psnr).

    Drop-in peer of optimize.optimize_tree (reference semantics:
    octree/optimization.py:134-249 — per-image full-frame MSE steps, val
    early stopping keeping the best snapshot) running on the dense
    tile-compositing pipeline instead of the gather-bound march. rcap/w1cap
    saturation sticky-regrows by rebuilding the optimizer at a larger cap
    and redoing the affected step, mirroring the march's K regrowth.
    """
    import optax

    from plenoctree_tpu.ops.metrics import compute_psnr
    from plenoctree_tpu.utils.io import host0_print as h0print, host0_tqdm

    h, w = train_gt[0].shape[:2]
    fx = float(focal)
    step_size = cfg.renderer_step_size

    state = {"rcap": 256, "ccap": 512, "w1cap": None}

    def build(leaf_prev=None):
        opt = TileOptimizer(
            tree, step_size=step_size, grid_c=grid_c,
            rcap=state["rcap"], ccap=state["ccap"],
        )
        if state["w1cap"] is not None:
            opt.r.w1cap = state["w1cap"]
        leaf = opt.initial_leaf_dataT() if leaf_prev is None else leaf_prev
        return opt, leaf

    opt, leaf = build()

    def regrow(n_max, nc_max, w1_over):
        """Returns True if a cap grew (caller must redo the step).
        n_max is informational only (the flat-lattice phase 1 never
        truncates runs)."""
        del n_max
        grew = False
        if nc_max > state["ccap"]:
            state["ccap"] = min(16384, state["ccap"] * 2)
            h0print(f"** regrowing tile ccap to {state['ccap']}")
            grew = True
        if w1_over > 0:
            cur = opt.r.w1cap or grid_c
            state["w1cap"] = min(grid_c, cur + int(w1_over) + 2)
            h0print(f"** regrowing tile w1cap to {state['w1cap']}")
            grew = True
        return grew

    if use_sgd:
        tx = optax.sgd(lr, momentum=sgd_momentum if sgd_momentum > 0 else None)
    else:
        tx = optax.adam(lr, eps=1e-8)
    opt_state = tx.init(leaf)
    apply_updates = jax.jit(
        lambda p, g, s: (lambda u, s2: (optax.apply_updates(p, u), s2))(
            *tx.update(g, s, p)
        )
    )

    def run_test(leaf):
        nonlocal opt
        while True:
            tpsnr = 0.0
            grew = False
            for c2w, gt in zip(test_c2w, test_gt):
                img, n_max, nc_max, w1o = opt.render(leaf, c2w, h, w, fx)
                if regrow(n_max, nc_max, w1o):
                    opt, _ = build(leaf)
                    grew = True
                    break
                im = np.clip(img, 0.0, 1.0)
                mse = float(((im - np.asarray(gt)[..., :3]) ** 2).mean())
                tpsnr += float(compute_psnr(mse))
            if not grew:
                return tpsnr / len(test_c2w)

    best_psnr = run_test(leaf)
    h0print("** initial val psnr", best_psnr)
    best_leaf = None
    for epoch in range(num_epochs):
        tpsnr = 0.0
        for c2w, gt in host0_tqdm(list(zip(train_c2w, train_gt))):
            gt3 = np.asarray(gt, np.float32)[..., :3]
            while True:
                (loss, (_, n_max, nc_max, w1o)), grad = opt.loss_and_grad(
                    leaf, c2w, gt3, h, w, fx
                )
                if regrow(int(n_max), int(nc_max), int(w1o)):
                    opt, _ = build(leaf)
                    continue
                break
            leaf, opt_state = apply_updates(leaf, grad, opt_state)
            tpsnr += float(compute_psnr(float(loss)))
        tpsnr /= len(train_c2w)
        h0print(f"epoch {epoch}: train_psnr {tpsnr:.4f}")

        if epoch % val_interval == val_interval - 1 or epoch == num_epochs - 1:
            val_psnr = run_test(leaf)
            h0print("** val psnr", val_psnr, "best", best_psnr)
            if val_psnr > best_psnr:
                best_psnr = val_psnr
                best_leaf = np.asarray(leaf)
            elif not continue_on_decrease:
                h0print("Stop since overfitting")
                break
    if best_leaf is not None:
        best_tree = tree.clone()
        opt.write_back(best_tree, jnp.asarray(best_leaf))
        return best_tree, best_psnr
    return None, best_psnr
