"""Octree fine-tuning: direct SGD/Adam on leaf data through the
differentiable renderer.

Parity: octree/optimization.py:134-249 — per-train-image full-image MSE, one
optimizer step per image (SGD lr ~1e7, the reference's scale: leaf-data
gradients of a mean-MSE are tiny), validation-PSNR early stopping keeping
the best snapshot.

TPU design (march.py): each step re-marches the rays with the CURRENT sigma
(cheap sigma-only gathers, non-differentiable geometry — svox's CUDA
backward likewise only flows through the cells its forward marched), then
one differentiable shade pass gathers full data rows for the contributor
slots only. Loss/grad accumulate on device across chunks; the host syncs a
single scalar per image (round-1 review flagged a blocking float() per
chunk).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from plenoctree_tpu.data.rays import generate_rays, convert_to_ndc
from plenoctree_tpu.octree import march as march_lib
from plenoctree_tpu.octree import renderer as renderer_lib
from plenoctree_tpu.ops.metrics import compute_psnr
from plenoctree_tpu.utils.io import host0_print as h0print, host0_tqdm


class TwoPhaseRenderer:
    """March-to-completion + shade helpers shared by train/val steps."""

    def __init__(self, arrays, fmt, basis_dim, opts, K=64):
        tables, meta = renderer_lib.split_arrays(arrays)
        self.data0 = tables.pop("data")
        self.tables = tables
        self.meta = meta
        self.fmt = fmt
        self.basis_dim = basis_dim
        self.opts = opts
        self.K = K
        self._march = jax.jit(
            functools.partial(march_lib.march_while, meta=meta, opts=opts),
            static_argnames=("cap",),
        )
        # Slot-overflow probe (K read from the carry shape): true when some
        # ray filled all K slots while still inside unsaturated volume —
        # the composite would be missing geometry (march.py::overflow_mask).
        self._overflow = jax.jit(
            lambda rp, c: jnp.any(
                march_lib.overflow_mask(rp, c, opts=opts, K=c["cells"].shape[1])
            )
        )
        self._sigma_of = jax.jit(lambda d: d[:, -1])
        self._shade = jax.jit(
            functools.partial(
                march_lib.shade,
                fmt=fmt,
                basis_dim=basis_dim,
                bg=opts.background_brightness,
            )
        )

        def sq_loss(data, cells, dts, count, basis, gt, mask):
            rgb = march_lib.shade(
                data, cells, dts, count, basis, fmt, basis_dim,
                opts.background_brightness,
            )
            rgb = jnp.clip(rgb, 0.0, 1.0)
            return jnp.sum(((rgb - gt) ** 2) * mask)

        self._sq_grad = jax.jit(jax.value_and_grad(sq_loss))

    def prep(self, o, d):
        return renderer_lib._prep_rays(
            self.tables, jnp.asarray(o), jnp.asarray(d), self.fmt, self.basis_dim
        )

    def march(self, data, rp, n_rays):
        """March to completion: ONE device dispatch (while_loop with
        device-side all-dead exit), zero host round-trips."""
        tables = dict(self.tables, sigma=self._sigma_of(data))
        carry = march_lib.init_carry(rp, n_rays, self.K)
        return self._march(tables, rp, carry, cap=self.opts.max_segments)

    def render(self, data, o, d):
        rp = self.prep(o, d)
        carry = self.march(data, rp, o.shape[0])
        return (
            self._shade(
                data, carry["cells"], carry["dts"], carry["count"], rp[6]
            ),
            self._overflow(rp, carry),
        )

    def loss_grad(self, data, o, d, gt, mask):
        rp = self.prep(o, d)
        carry = self.march(data, rp, o.shape[0])
        sq, g = self._sq_grad(
            data, carry["cells"], carry["dts"], carry["count"], rp[6], gt, mask
        )
        return sq, g, self._overflow(rp, carry)


def _image_rays(c2w, h, w, focal, ndc):
    rays = generate_rays(w, h, focal, np.asarray(c2w)[None])
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)
    if ndc is not None:
        o, d = convert_to_ndc(o, d, ndc["focal"], ndc["width"], ndc["height"])
    return o.astype(np.float32), d.astype(np.float32)


def optimize_tree(
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
    chunk=16384,
    ndc=None,
    rays_per_step=0,
):
    """Fine-tune leaf data; returns (best_tree_or_None, best_val_psnr).

    rays_per_step > 0 switches from the reference's full-image steps to
    uniformly subsampled rays per step (an unbiased minibatch of the same
    per-image MSE gradient) — the TPU-friendly mode for large images where
    the march is gather-latency-bound.
    """
    h, w = train_gt[0].shape[:2]
    arrays = renderer_lib.tree_arrays(tree)
    opts = renderer_lib.RenderOptions(
        step_size=cfg.renderer_step_size,
        max_segments=getattr(cfg, "max_segments", 0)
        or renderer_lib.default_max_segments(tree),
    )
    fmt = tree.data_format.format
    basis_dim = tree.data_format.basis_dim
    rend = TwoPhaseRenderer(
        arrays, fmt, basis_dim, opts,
        # Upfront K sizing from occupancy stats (march.estimate_contrib_slots)
        # skips the sticky-regrowth re-march ladder on dense trees; explicit
        # cfg.contrib_slots still overrides.
        K=getattr(cfg, "contrib_slots", 0)
        or march_lib.estimate_contrib_slots(tree, opts.sigma_thresh),
    )
    data = rend.data0

    if use_sgd:
        tx = optax.sgd(lr, momentum=sgd_momentum if sgd_momentum > 0 else None)
    else:
        tx = optax.adam(lr, eps=1e-8)
    opt_state = tx.init(data)
    apply_updates = jax.jit(
        lambda data, grad, opt_state, denom: _apply(tx, data, grad, opt_state, denom)
    )

    def _grow_K():
        """Sticky contributor-slot regrowth (march.py::overflow_mask): dense
        volumetric trees overflow the surface-shell default of 64."""
        if rend.K >= 2048:
            import warnings

            warnings.warn(
                f"march contributor slots clipped at K={rend.K}; "
                "optimizing with truncated geometry"
            )
            return False
        rend.K *= 2
        h0print(f"** regrowing march contributor slots to K={rend.K}")
        return True

    def eff_chunk():
        # Bound rays x K per dispatch: the differentiable shade gathers
        # [chunk, K, data_dim] rows and its backward keeps several
        # same-scale residuals — at K=2048 a full 16k-ray image is ~7 GB
        # and OOMs a 16 GB chip. 16384x256 slot-rows (~220 MB gathered)
        # leaves headroom for the data grads at 15M+ leaves.
        return min(chunk, max(2048, (16384 * 256) // max(rend.K, 1)))

    def run_test():
        while True:
            tpsnr = 0.0
            overflow = None
            for c2w, gt in zip(test_c2w, test_gt):
                o, d = _image_rays(c2w, h, w, focal, ndc)
                outs = []
                ck = eff_chunk()
                for i in range(0, o.shape[0], ck):
                    oo, dd = _pad_chunk(o, d, i, ck)
                    rgb, ov = rend.render(data, oo, dd)
                    outs.append(np.asarray(rgb))
                    overflow = ov if overflow is None else overflow | ov
                im = np.concatenate(outs, 0)[: o.shape[0]].reshape(h, w, 3)
                im = np.clip(im, 0.0, 1.0)
                mse = float(((im - gt[..., :3]) ** 2).mean())
                tpsnr += float(compute_psnr(mse))
            if overflow is not None and bool(overflow) and _grow_K():
                continue
            return tpsnr / len(test_c2w)

    best_psnr = run_test()
    h0print("** initial val psnr", best_psnr)
    best_data = None
    ray_rng = np.random.default_rng(20200823)
    ones_cache = {}
    for epoch in range(num_epochs):
        tpsnr = 0.0
        for c2w, gt in host0_tqdm(list(zip(train_c2w, train_gt))):
            o, d = _image_rays(c2w, h, w, focal, ndc)
            gtf = np.asarray(gt[..., :3], np.float32).reshape(-1, 3)
            if rays_per_step and rays_per_step < o.shape[0]:
                sel = ray_rng.integers(0, o.shape[0], size=rays_per_step)
                o, d, gtf = o[sel], d[sel], gtf[sel]
            while True:
                sq_total = None
                grad_acc = None
                overflow = None
                ck = eff_chunk()
                if ck not in ones_cache:
                    ones_cache[ck] = jnp.ones((ck, 1), jnp.float32)
                for i in range(0, o.shape[0], ck):
                    oo, dd = _pad_chunk(o, d, i, ck)
                    gg = jnp.asarray(_pad_rows(gtf[i : i + ck], ck))
                    n_real = min(ck, o.shape[0] - i)
                    if n_real < ck:
                        mask = np.zeros((ck, 1), np.float32)
                        mask[:n_real] = 1.0
                        mask = jnp.asarray(mask)
                    else:
                        mask = ones_cache[ck]
                    sq, g, ov = rend.loss_grad(data, oo, dd, gg, mask)
                    # Device-side accumulation: no host sync inside the loop.
                    sq_total = sq if sq_total is None else sq_total + sq
                    grad_acc = (
                        g if grad_acc is None else jax.tree.map(jnp.add, grad_acc, g)
                    )
                    overflow = ov if overflow is None else overflow | ov
                if bool(overflow) and _grow_K():
                    continue  # redo this image with more slots, no update
                break
            # Mean over the rays actually marched (equals the reference's
            # full-image mean when rays_per_step is off).
            denom = float(o.shape[0] * 3)
            data, opt_state = apply_updates(data, grad_acc, opt_state, denom)
            tpsnr += float(compute_psnr(float(sq_total) / denom))  # 1 sync/image
        tpsnr /= len(train_c2w)
        h0print(f"epoch {epoch}: train_psnr {tpsnr:.4f}")

        if epoch % val_interval == val_interval - 1 or epoch == num_epochs - 1:
            val_psnr = run_test()
            h0print("** val psnr", val_psnr, "best", best_psnr)
            if val_psnr > best_psnr:
                best_psnr = val_psnr
                best_data = np.asarray(data)
            elif not continue_on_decrease:
                h0print("Stop since overfitting")
                break
    if best_data is not None:
        best_tree = tree.clone()
        renderer_lib.write_back_data(best_tree, best_data)
        return best_tree, best_psnr
    return None, best_psnr


def _apply(tx, data, grad, opt_state, denom):
    grad = jax.tree.map(lambda x: x / denom, grad)
    updates, opt_state = tx.update(grad, opt_state, data)
    return optax.apply_updates(data, updates), opt_state


def _pad_chunk(o, d, i, chunk):
    oo = _pad_rows(o[i : i + chunk], chunk)
    dd = _pad_rows(d[i : i + chunk], chunk)
    return jnp.asarray(oo), jnp.asarray(dd)


def _pad_rows(x, chunk):
    if x.shape[0] == chunk:
        return x
    return np.pad(x, ((0, chunk - x.shape[0]), (0, 0)), mode="edge")
