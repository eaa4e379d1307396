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


def _posenc_tile(raw, min_deg, max_deg):
    """In-tile positional encoding, ops/posenc.py non-legacy layout:
    [x, sin(2^i x)..., cos(2^i x)...]."""
    flat = jnp.concatenate([raw * (2.0**i) for i in range(min_deg, max_deg)], -1)
    half_pi = jnp.float32(0.5 * np.pi)
    return jnp.concatenate([raw, jnp.sin(flat), jnp.sin(flat + half_pi)], -1)


def _fwd_tile(refs_w, x, meta, save_acts=False):
    """Run the trunk on one tile x [T, x_dim] (f32). Returns (out, acts)."""
    depth = meta["depth"]
    acts = []
    if meta.get("posenc"):
        x = _posenc_tile(x, *meta["posenc"])
    h = x
    for i in range(depth):
        w = refs_w[2 * i][...]
        b = refs_w[2 * i + 1][...]
        pre = (
            jnp.dot(
                h.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + b
        )
        h = jnp.maximum(pre, 0.0)
        if save_acts:
            acts.append(h)
        if i % meta["skip_layer"] == 0 and i > 0:
            h = jnp.concatenate([h, x], axis=-1)
    hw = refs_w[2 * depth][...]
    hb = refs_w[2 * depth + 1][...]
    out = (
        jnp.dot(
            h.astype(jnp.bfloat16),
            hw.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + hb
    )
    return out, acts


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
        refs_w = refs[i : i + 2 * (depth + 1)]
        sigma_ref = refs[i + 2 * (depth + 1)]
        rgb_ref = refs[i + 1 + 2 * (depth + 1)]
        out, _ = _fwd_tile(refs_w, x_ref[...], meta)
        # Split in-tile: separate outputs avoid HBM slice copies outside.
        sigma_ref[...] = out[:, :ns]
        if sh_dim:
            # SH decode in the epilogue: contract each channel's sh_dim
            # coefficients with the per-row basis (f32 VPU lane reduction) —
            # the [N, C*sh_dim] coefficient block never touches HBM.
            b = basis_ref[...]
            coeffs = out[:, ns:]
            nc = (meta["d_out"] - ns) // sh_dim
            rgb_ref[...] = jnp.concatenate(
                [
                    jnp.sum(
                        coeffs[:, c * sh_dim : (c + 1) * sh_dim] * b,
                        axis=-1,
                        keepdims=True,
                    )
                    for c in range(nc)
                ],
                axis=-1,
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


def _make_bwd_kernel(meta):
    depth = meta["depth"]
    skip = meta["skip_layer"]
    width = meta["width"]
    sh_dim = meta.get("sh_dim", 0)
    meta_enc = dict(meta, posenc=None)  # bwd encodes once, reuses below

    def kernel(*refs):
        x_ref = refs[0]
        i0 = 1
        basis_ref = None
        if sh_dim:
            basis_ref = refs[i0]
            i0 += 1
        refs_w = refs[i0 : i0 + 2 * (depth + 1)]
        g_sigma_ref = refs[i0 + 2 * (depth + 1)]
        g_rgb_ref = refs[i0 + 1 + 2 * (depth + 1)]
        grefs = refs[i0 + 2 + 2 * (depth + 1) :]  # gradient accumulators

        i_step = pl.program_id(0)

        @pl.when(i_step == 0)
        def _():
            for gr in grefs:
                gr[...] = jnp.zeros_like(gr)

        x = x_ref[...]
        if meta.get("posenc"):
            x = _posenc_tile(x, *meta["posenc"])
        out, acts = _fwd_tile(refs_w, x, meta_enc, save_acts=True)
        del out  # linear head: bwd needs only activations

        if sh_dim:
            # Cotangent through the in-epilogue SH decode:
            # d(coeff[n, c*K+k]) = g_rgb3[n, c] * basis[n, k].
            b = basis_ref[...]
            g3 = g_rgb_ref[...]
            nc = g3.shape[-1]
            g_coeff = jnp.concatenate(
                [g3[:, c : c + 1] * b for c in range(nc)], axis=-1
            )
            g = jnp.concatenate([g_sigma_ref[...], g_coeff], axis=-1)
        else:
            g = jnp.concatenate([g_sigma_ref[...], g_rgb_ref[...]], axis=-1)

        # Head grads.
        h_last = acts[depth - 1]
        if (depth - 1) % skip == 0 and depth - 1 > 0:
            h_last_in = jnp.concatenate([h_last, x], axis=-1)
        else:
            h_last_in = h_last
        grefs[2 * depth][...] += _dot_tn(h_last_in, g)
        grefs[2 * depth + 1][...] += jnp.sum(g, axis=0, keepdims=True)
        hw = refs_w[2 * depth][...]
        dh = _dot_nt(g, hw)
        if (depth - 1) % skip == 0 and depth - 1 > 0:
            dh = dh[:, :width]

        # Trunk layers in reverse.
        for i in range(depth - 1, -1, -1):
            post = acts[i]
            dpre = dh * (post > 0)
            # Layer input (recomputed from saved activations).
            if i == 0:
                h_in = x
            else:
                h_in = acts[i - 1]
                if (i - 1) % skip == 0 and i - 1 > 0:
                    h_in = jnp.concatenate([h_in, x], axis=-1)
            grefs[2 * i][...] += _dot_tn(h_in, dpre)
            grefs[2 * i + 1][...] += jnp.sum(dpre, axis=0, keepdims=True)
            if i > 0:
                w = refs_w[2 * i][...]
                dh = _dot_nt(dpre, w)
                if (i - 1) % skip == 0 and i - 1 > 0:
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


def _pallas_fwd(flat_w, x_p, meta, basis_p=None):
    n = x_p.shape[0]
    grid = (n // TILE,)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_w
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
    )(x_p, *basis_args, *flat_w)
    return sigma, rgb


def _pallas_bwd(flat_w, x_p, g_sigma, g_rgb, meta, basis_p=None):
    n = x_p.shape[0]
    grid = (n // TILE,)
    ns = meta["n_sigma"]
    nr = _rgb_width(meta)
    sh_dim = meta.get("sh_dim", 0)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_w
    ]
    g_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_w
    ]
    g_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_w]
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
    )(x_p, *basis_args, *flat_w, g_sigma, g_rgb)
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
    """
    sh_dim = meta.get("sh_dim", 0)

    def prep(x):
        # Row padding only (to a TILE multiple); features stay unpadded and
        # Mosaic aligns them internally.
        n = x.shape[0]
        n_p = _round_up(max(n, TILE), TILE)
        x = x.astype(jnp.bfloat16)
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
        sigma, rgb = _pallas_fwd(list(flat_w), x_p, meta, b_p)
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
        grads = _pallas_bwd(list(flat_w), x_p, g_sigma, g_rgb, meta, b_p)
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
