"""Fused NeRF-trunk MLP as a single Pallas TPU kernel (fwd + custom bwd).

The whole trunk (8x256 + skip + fused sigma/rgb head, ~0.5M params) fits in
VMEM, so one kernel walks all layers per row-tile: activations never round-
trip to HBM (XLA's layer-by-layer schedule writes/reads each [N, 256]
activation, ~6 GB/step at the flagship batch). The backward kernel
recomputes the forward per tile flash-style, then walks layers in reverse,
accumulating f32 weight gradients across the sequential TPU grid.

Scope: the non-view-conditioned trunk used by SH/SG models (the flagship
path; condition branch models fall back to the flax module). Gradients are
returned for parameters only — sample positions never need gradients in this
framework (coarse z comes from RNG, fine z is stop_gradient'ed,
ops/sampling.py:286).

Numerics: matmuls in bf16 with f32 accumulation (MXU native), relu in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # rows per grid step (2048 exceeds VMEM in the bwd kernel)


def _round_up(x, m):
    return (x + m - 1) // m * m


def pack_params(params, skip_layer=4, posenc=None):
    """flax TrunkMLP params (condition=False) -> (weights list, meta).

    meta: dict(depth, d_in, width, d_out, skip_layer[, posenc]).
    Weight layout per layer: trunk kernels/biases in call order, then the
    fused head [width, 1 + rgb] built from Dense_{depth} (sigma) and
    Dense_{depth+1} (rgb). With posenc=(min_deg, max_deg), the kernel takes
    raw [N, 3] points and computes the positional encoding in-tile (the
    encoded features never touch HBM).
    """
    names = sorted(params.keys(), key=lambda k: int(k.split("_")[1]))
    depth = len(names) - 2
    kernels = [np.asarray(params[n]["kernel"]) for n in names]
    biases = [np.asarray(params[n]["bias"]) for n in names]
    d_in = kernels[0].shape[0]
    width = kernels[0].shape[1]
    w_sigma, w_rgb = kernels[depth], kernels[depth + 1]
    b_sigma, b_rgb = biases[depth], biases[depth + 1]
    head_w = np.concatenate([w_sigma, w_rgb], axis=1)
    head_b = np.concatenate([b_sigma, b_rgb], axis=0)
    d_out = head_w.shape[1]

    # No feature padding: Mosaic aligns sub-lane-width blocks internally,
    # which beats materializing padded copies of [N, d_in] in HBM.
    meta = dict(
        depth=depth,
        d_in=d_in,
        width=width,
        d_out=d_out,
        skip_layer=skip_layer,
        posenc=posenc,
        x_dim=3 if posenc else d_in,
        n_sigma=kernels[depth].shape[1],
        sh_dim=0,
    )
    flat = []
    for i in range(depth):
        flat.append(jnp.asarray(kernels[i], jnp.float32))
        flat.append(jnp.asarray(biases[i], jnp.float32).reshape(1, -1))
    flat.append(jnp.asarray(head_w, jnp.float32))
    flat.append(jnp.asarray(head_b, jnp.float32).reshape(1, -1))
    return flat, meta


def _layer_has_x(i, skip):
    """Whether layer i's input contains the (encoded) sample features:
    layer 0 always; layer i>0 iff the previous layer ended in a skip concat
    (reference rule: concat after layer j when j % skip == 0 and j > 0)."""
    return i == 0 or ((i - 1) % skip == 0 and i - 1 > 0)


def _posenc_consts(min_deg, max_deg):
    """(S [3, 6F], off [1, 6F]) so that sin(x @ S + off) is the fused
    four_feat [sin(2^f x)..., cos(2^f x)...] in ops/posenc.py's non-legacy
    layout (freq-major, xyz-minor). Built from iotas (Pallas kernels cannot
    capture array constants; Mosaic folds these at compile time). The scales
    come from an integer shift — exact powers of two, so the K=3 one-hot
    matmul at f32 precision reproduces the XLA path's phases bit-exactly."""
    assert min_deg >= 0, "posenc shift-built scales need min_deg >= 0"
    nf = max_deg - min_deg
    c = jax.lax.broadcasted_iota(jnp.int32, (3, 6 * nf), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (3, 6 * nf), 1)
    jm = j % (3 * nf)
    pow2 = jax.lax.shift_left(jnp.int32(1), min_deg + jm // 3).astype(jnp.float32)
    s = jnp.where(jm % 3 == c, pow2, 0.0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (1, 6 * nf), 1)
    off = jnp.where(jr >= 3 * nf, jnp.float32(0.5 * np.pi), jnp.float32(0.0))
    return s, off


def _posenc_four(x3, min_deg, max_deg):
    """four_feat [T, 6F] from raw coords [T, 3] (f32), concat-free: one
    constant matmul (HIGHEST — DEFAULT would bf16-truncate the coords and
    scramble the high-frequency phases) and one wide sin."""
    s, off = _posenc_consts(min_deg, max_deg)
    xs = jax.lax.dot(
        x3, s, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # bf16 result: every consumer is a bf16 matmul operand — same cast point
    # as the XLA posenc path, and the f32 sin output dies immediately
    # (scoped-VMEM headroom; the bwd kernel is near Mosaic's 16 MB limit).
    return jnp.sin(xs + off).astype(jnp.bfloat16)


def _dot_bf(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _fwd_tile(refs_w, x, meta, save_acts=False):
    """Run the trunk on one tile. Returns (out, acts).

    x: [T, d_in] encoded features — or, with meta["posenc"], the tuple
    (x3 [T, 3] f32, four [T, 6F] f32). In posenc mode there are NO in-kernel
    concats: every layer whose input contains the encoded features consumes
    (h, x3, four) via split weight blocks (see _kernel_weights) — 3-wide
    lane concats are Mosaic relayouts, split matmuls are free.
    """
    depth = meta["depth"]
    skip = meta["skip_layer"]
    pe = meta.get("posenc")
    acts = []
    if pe:
        x3, four = x
    h = None if pe else x
    cur = 0
    out = None
    for i in range(depth + 1):  # trunk layers + fused head
        if pe and _layer_has_x(i, skip):
            wh = None
            if i > 0:
                wh = refs_w[cur][...]
                cur += 1
            wa = refs_w[cur][...]
            wbc = refs_w[cur + 1][...]
            b = refs_w[cur + 2][...]
            cur += 3
            pre = _dot_bf(x3, wa) + _dot_bf(four, wbc) + b
            if wh is not None:
                pre = pre + _dot_bf(h, wh)
        else:
            w = refs_w[cur][...]
            b = refs_w[cur + 1][...]
            cur += 2
            pre = _dot_bf(h, w) + b
        if i == depth:
            out = pre
        else:
            # Activations live in bf16 between layers: every consumer is a
            # bf16 matmul operand (bit-identical to casting at the matmul)
            # and the bwd kernel's 8 saved tiles halve — it was 2.15 MB
            # OVER Mosaic's 16 MB scoped-vmem limit with f32 acts + the
            # in-kernel posenc state.
            h = jnp.maximum(pre, 0.0).astype(jnp.bfloat16)
            if save_acts:
                acts.append(h)
            if (not pe) and i % skip == 0 and i > 0:
                h = jnp.concatenate([h, x], axis=-1)
    return out, acts


def _channel_selector(nc, sh_dim):
    """[C*K, C] block indicator: sel[c*K+k, c] = 1. dot(prod, sel) sums each
    channel's K lanes on the MXU (trace-time constant, hoisted by Mosaic)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (nc * sh_dim, nc), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nc * sh_dim, nc), 1)
    return (j // sh_dim == c).astype(jnp.float32)


def _make_fwd_kernel(meta):
    depth = meta["depth"]
    ns = meta["n_sigma"]
    sh_dim = meta.get("sh_dim", 0)

    def kernel(*refs):
        x_ref = refs[0]
        i = 1
        basis_ref = None
        if sh_dim:
            basis_ref = refs[i]
            i += 1
        _, n_w = _w_offsets(meta)
        refs_w = refs[i : i + n_w]
        sigma_ref = refs[i + n_w]
        rgb_ref = refs[i + 1 + n_w]
        x = x_ref[...]
        if meta.get("posenc"):
            x = (x, _posenc_four(x, *meta["posenc"]))
        out, _ = _fwd_tile(refs_w, x, meta)
        # Split in-tile: separate outputs avoid HBM slice copies outside.
        sigma_ref[...] = out[:, :ns]
        if sh_dim:
            # SH decode in the epilogue: one elementwise product against the
            # channel-tiled basis, then the per-channel 16-lane sums as a
            # single matmul with a constant block indicator — cross-lane VPU
            # reduces on [T, 16] slices are multi-pass relayouts; the MXU is
            # idle here. HIGHEST keeps the f32 products unrounded (DEFAULT
            # would bf16-truncate them). The [N, C*sh_dim] coefficient block
            # never touches HBM.
            b = basis_ref[...]
            coeffs = out[:, ns:]
            nc = (meta["d_out"] - ns) // sh_dim
            prod = coeffs * jnp.concatenate([b] * nc, axis=-1)
            rgb_ref[...] = jax.lax.dot(
                prod,
                _channel_selector(nc, sh_dim),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        else:
            rgb_ref[...] = out[:, ns:]

    return kernel


def _dot_tn(a, b):
    """a^T @ b via dot_general (contract rows) — no materialized transpose."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_nt(a, b):
    """a @ b^T via dot_general (contract cols of both)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _w_offsets(meta):
    """(per-layer start offsets into the kernel weight-ref list, total).

    Posenc mode splits each x-consuming layer into (wh? , wa, wbc, b); every
    other layer (and all layers in non-posenc mode) is (w, b)."""
    pe = meta.get("posenc")
    offs = []
    cur = 0
    for i in range(meta["depth"] + 1):
        offs.append(cur)
        if pe and _layer_has_x(i, meta["skip_layer"]):
            cur += 3 if i == 0 else 4
        else:
            cur += 2
    return offs, cur


def _make_bwd_kernel(meta):
    depth = meta["depth"]
    skip = meta["skip_layer"]
    width = meta["width"]
    sh_dim = meta.get("sh_dim", 0)
    pe = meta.get("posenc")
    offs, n_w = _w_offsets(meta)

    def kernel(*refs):
        x_ref = refs[0]
        i0 = 1
        basis_ref = None
        if sh_dim:
            basis_ref = refs[i0]
            i0 += 1
        refs_w = refs[i0 : i0 + n_w]
        g_sigma_ref = refs[i0 + n_w]
        g_rgb_ref = refs[i0 + 1 + n_w]
        grefs = refs[i0 + 2 + n_w :]  # gradient accumulators, same layout

        i_step = pl.program_id(0)

        @pl.when(i_step == 0)
        def _():
            for gr in grefs:
                gr[...] = jnp.zeros_like(gr)

        x = x_ref[...]
        if pe:
            four = _posenc_four(x, *pe)
            xin = (x, four)
        else:
            xin = x
        out, acts = _fwd_tile(refs_w, xin, meta, save_acts=True)
        del out  # linear head: bwd needs only activations

        if sh_dim:
            # Cotangent through the in-epilogue SH decode:
            # d(coeff[n, c*K+k]) = g_rgb3[n, c] * basis[n, k]. Broadcast
            # form (not the fwd's selector matmul): the bwd kernel sits
            # 0.3 MB under Mosaic's 16 MB scoped-vmem limit and the extra
            # [T, C*K] intermediates of the matmul form tip it over.
            b = basis_ref[...]
            g3 = g_rgb_ref[...]
            nc = g3.shape[-1]
            g_coeff = jnp.concatenate(
                [g3[:, c : c + 1] * b for c in range(nc)], axis=-1
            )
            g = jnp.concatenate([g_sigma_ref[...], g_coeff], axis=-1)
        else:
            g = jnp.concatenate([g_sigma_ref[...], g_rgb_ref[...]], axis=-1)

        def accum_layer(i, dpre):
            """Weight/bias grads for layer i given its pre-activation
            cotangent; returns the h-part weight ref (for dh) or None."""
            o = offs[i]
            h_prev = acts[i - 1] if i > 0 else None
            if pe and _layer_has_x(i, skip):
                k = o
                wh = None
                if i > 0:
                    grefs[k][...] += _dot_tn(h_prev, dpre)
                    wh = refs_w[k]
                    k += 1
                grefs[k][...] += _dot_tn(x, dpre)
                grefs[k + 1][...] += _dot_tn(four, dpre)
                grefs[k + 2][...] += jnp.sum(dpre, axis=0, keepdims=True)
                return wh
            h_in = h_prev if i > 0 else x
            if (not pe) and i > 0 and (i - 1) % skip == 0 and i - 1 > 0:
                h_in = jnp.concatenate([h_in, x], axis=-1)
            grefs[o][...] += _dot_tn(h_in, dpre)
            grefs[o + 1][...] += jnp.sum(dpre, axis=0, keepdims=True)
            return refs_w[o]

        # Head, then trunk layers in reverse. dh flows only through the
        # h-part of split layers (x never needs gradients here).
        wh = accum_layer(depth, g)
        dh = _dot_nt(g, wh[...])
        if (not pe) and (depth - 1) % skip == 0 and depth - 1 > 0:
            dh = dh[:, :width]
        for i in range(depth - 1, -1, -1):
            # ReLU mask in f32: acts are stored bf16 and Mosaic on this
            # target rejects packed-bf16 vector compares ("Target does not
            # support this comparison" on vector<8x128x2xbf16> cmpf).
            dpre = dh * (acts[i].astype(jnp.float32) > 0)
            wh = accum_layer(i, dpre)
            if i > 0:
                dh = _dot_nt(dpre, wh[...])
                if (not pe) and (i - 1) % skip == 0 and i - 1 > 0:
                    dh = dh[:, :width]

    return kernel


def _interpret():
    # Pallas TPU kernels run interpreted on the CPU backend (tests).
    return jax.default_backend() == "cpu"


def _rgb_width(meta):
    ns = meta["n_sigma"]
    sh_dim = meta.get("sh_dim", 0)
    nr = meta["d_out"] - ns
    return nr // sh_dim if sh_dim else nr


def _kernel_weights(flat_w, meta):
    """Original per-layer [w, b] list (f32) -> the kernel's weight-ref list.

    Posenc mode splits every x-consuming layer's weight into row blocks
    (wh [width, out] for i>0, wa [3, out], wbc [6F, out]) so the kernel
    consumes (h, x3, four) with separate matmuls instead of a lane concat.
    Matmul operands are cast to bf16 here, once per call — an in-kernel
    astype would re-run per grid step. Biases stay f32.
    """
    pe = meta.get("posenc")
    depth = meta["depth"]
    out = []
    for i in range(depth + 1):
        w, b = flat_w[2 * i], flat_w[2 * i + 1]
        if pe and _layer_has_x(i, meta["skip_layer"]):
            if i > 0:
                out.append(w[: meta["width"]].astype(jnp.bfloat16))
                w = w[meta["width"] :]
            out.append(w[:3].astype(jnp.bfloat16))
            out.append(w[3:].astype(jnp.bfloat16))
            out.append(b)
        else:
            out.append(w.astype(jnp.bfloat16))
            out.append(b)
    return out


def _unsplit_grads(grads, meta):
    """Reassemble _kernel_weights' split-layer grads back to the original
    per-layer [dw, db] layout (row order: [h-part, x3, four] matches the
    encoded-input column order [x, sin..., cos...])."""
    pe = meta.get("posenc")
    if not pe:
        return list(grads)
    out = []
    cur = 0
    for i in range(meta["depth"] + 1):
        if _layer_has_x(i, meta["skip_layer"]):
            parts = []
            if i > 0:
                parts.append(grads[cur])
                cur += 1
            parts.extend([grads[cur], grads[cur + 1]])
            cur += 2
            out.append(jnp.concatenate(parts, axis=0))
            out.append(grads[cur])
            cur += 1
        else:
            out.extend([grads[cur], grads[cur + 1]])
            cur += 2
    return out


def _pallas_fwd(kernel_w, x_p, meta, basis_p=None):
    n = x_p.shape[0]
    grid = (n // TILE,)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in kernel_w
    ]
    ns = meta["n_sigma"]
    nr = _rgb_width(meta)
    sh_dim = meta.get("sh_dim", 0)
    basis_specs, basis_args = [], []
    if sh_dim:
        basis_specs = [
            pl.BlockSpec((TILE, sh_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        basis_args = [basis_p]
    sigma, rgb = pl.pallas_call(
        _make_fwd_kernel(meta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, meta["x_dim"]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + basis_specs
        + w_specs,
        out_specs=(
            pl.BlockSpec((TILE, ns), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, nr), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, ns), jnp.float32),
            jax.ShapeDtypeStruct((n, nr), jnp.float32),
        ),
        interpret=_interpret(),
    )(x_p, *basis_args, *kernel_w)
    return sigma, rgb


def _pallas_bwd(kernel_w, x_p, g_sigma, g_rgb, meta, basis_p=None):
    n = x_p.shape[0]
    grid = (n // TILE,)
    ns = meta["n_sigma"]
    nr = _rgb_width(meta)
    sh_dim = meta.get("sh_dim", 0)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in kernel_w
    ]
    g_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in kernel_w
    ]
    g_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in kernel_w]
    basis_specs, basis_args = [], []
    if sh_dim:
        basis_specs = [
            pl.BlockSpec((TILE, sh_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        basis_args = [basis_p]
    grads = pl.pallas_call(
        _make_bwd_kernel(meta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, meta["x_dim"]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + basis_specs
        + w_specs
        + [
            pl.BlockSpec((TILE, ns), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, nr), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(g_specs),
        out_shape=tuple(g_shapes),
        interpret=_interpret(),
    )(x_p, *basis_args, *kernel_w, g_sigma, g_rgb)
    return grads


def make_fused_trunk(meta):
    """Returns fused(flat_w, x[, basis]) with a custom VJP.

    Without meta["sh_dim"]: (sigma [N, ns], raw_rgb [N, d_out-ns]).
    With meta["sh_dim"]=K: the head's C*K SH coefficients are contracted
    against the per-row basis [N, K] inside the kernel epilogue and the
    call returns (sigma [N, ns], rgb [N, C]) — the coefficient block never
    round-trips HBM in either direction (the backward reconstructs its
    cotangent from g_rgb x basis in-tile).

    x: [N, x_dim] (unpadded); flat_w: the pack_params list (f32). x is fed to
    the kernel in bf16 (the kernel's matmuls are bf16 anyway — same numerics
    as the flax compute_dtype=bfloat16 path, half the input DMA traffic);
    basis stays f32 (the decode contraction runs on the VPU in f32).

    With meta["posenc"]=(min_deg, max_deg): x is the raw [N, 3] sample
    coordinates and the kernel computes the positional encoding in-tile as
    sin(x @ S + off) — the [N, 63] encoded features never exist in HBM, in
    either direction. x then stays f32 (bf16 coords would scramble the
    high-frequency phases; sin results are cast to bf16 at the matmuls,
    matching the XLA path's cast point).
    """
    sh_dim = meta.get("sh_dim", 0)

    def prep(x):
        # Row padding only (to a TILE multiple); features stay unpadded and
        # Mosaic aligns them internally.
        n = x.shape[0]
        n_p = _round_up(max(n, TILE), TILE)
        x = x.astype(jnp.float32 if meta.get("posenc") else jnp.bfloat16)
        if n_p != n:
            x = jnp.pad(x, ((0, n_p - n), (0, 0)))
        return x, n

    def prep_basis(basis, n_p):
        basis = basis.astype(jnp.float32)
        if basis.shape[0] != n_p:
            basis = jnp.pad(basis, ((0, n_p - basis.shape[0]), (0, 0)))
        return basis

    @jax.custom_vjp
    def fused(flat_w, x, basis):
        x_p, n = prep(x)
        b_p = prep_basis(basis, x_p.shape[0]) if sh_dim else None
        sigma, rgb = _pallas_fwd(_kernel_weights(list(flat_w), meta), x_p, meta, b_p)
        return sigma[:n], rgb[:n]

    def fwd(flat_w, x, basis):
        return fused(flat_w, x, basis), (flat_w, x, basis)

    def bwd(res, g):
        flat_w, x, basis = res
        g_sigma, g_rgb = g
        x_p, n = prep(x)
        n_p = x_p.shape[0]
        b_p = prep_basis(basis, n_p) if sh_dim else None
        g_sigma = g_sigma.astype(jnp.float32)
        g_rgb = g_rgb.astype(jnp.float32)
        if n_p != n:
            g_sigma = jnp.pad(g_sigma, ((0, n_p - n), (0, 0)))
            g_rgb = jnp.pad(g_rgb, ((0, n_p - n), (0, 0)))
        grads = _pallas_bwd(
            _kernel_weights(list(flat_w), meta), x_p, g_sigma, g_rgb, meta, b_p
        )
        grads = _unsplit_grads(grads, meta)
        return tuple(grads), jnp.zeros_like(x), jnp.zeros_like(basis)

    fused.defvjp(fwd, bwd)

    def call(flat_w, x, basis=None):
        # Positions never need gradients in this framework (coarse z is RNG,
        # fine z is stop_gradient'ed) — cutting them here erases the whole
        # posenc backward chain from the program. The basis likewise (view
        # directions are inputs).
        if sh_dim:
            assert basis is not None, "meta['sh_dim'] set but no basis given"
            basis = jax.lax.stop_gradient(basis)
        else:
            basis = jnp.zeros((0, 0), jnp.float32) if basis is None else basis
        return fused(tuple(flat_w), jax.lax.stop_gradient(x), basis)

    return call


def pack_params_traced(kernels, biases, skip_layer=4, posenc=None, sh_dim=0):
    """Traced (jnp) version of pack_params for use inside a jitted model:
    the head concat is a differentiable op, so grads from the fused kernel's
    custom VJP flow back to the original flax params.

    Args:
      kernels/biases: lists in call order (trunk..., sigma head, rgb head).
      posenc: optional (min_deg, max_deg) to fuse the positional encoding.
      sh_dim: if > 0, the rgb head emits C*sh_dim SH coefficients and the
        kernel decodes them against a per-row basis in its epilogue.

    Returns:
      (flat list of f32 arrays, meta dict).
    """
    depth = len(kernels) - 2
    d_in = kernels[0].shape[0]
    width = kernels[0].shape[1]
    head_w = jnp.concatenate([kernels[depth], kernels[depth + 1]], axis=1)
    head_b = jnp.concatenate([biases[depth], biases[depth + 1]], axis=0)
    d_out = head_w.shape[1]
    flat = []
    for i in range(depth):
        flat.append(kernels[i].astype(jnp.float32))
        flat.append(biases[i].astype(jnp.float32).reshape(1, -1))
    flat.append(head_w.astype(jnp.float32))
    flat.append(head_b.astype(jnp.float32).reshape(1, -1))
    n_sigma = kernels[depth].shape[1]
    if sh_dim:
        assert (d_out - n_sigma) % sh_dim == 0, (d_out, n_sigma, sh_dim)
    meta = dict(
        depth=depth,
        d_in=d_in,
        width=width,
        d_out=d_out,
        skip_layer=skip_layer,
        posenc=posenc,
        x_dim=3 if posenc else d_in,
        n_sigma=n_sigma,
        sh_dim=sh_dim,
    )
    return flat, meta


class FusedTrunk:
    """Convenience wrapper: bind flax TrunkMLP params, call on [N, d_in]."""

    def __init__(self, params, skip_layer=4):
        self.flat_w, self.meta = pack_params(params, skip_layer)
        self._fn = jax.jit(make_fused_trunk(self.meta))

    def __call__(self, x):
        sigma, rgb = self._fn(self.flat_w, x)
        return rgb, sigma  # (raw_rgb, raw_sigma)
