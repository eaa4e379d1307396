"""Octree evaluation: render all test views, compute PSNR/SSIM/LPIPS.

Parity: octree/nerf/utils.py:448-498 (eval_octree). LPIPS uses the JAX
VGG-LPIPS port (ops.lpips) when its weights file is available, else NaN
(this container cannot download pretrained VGG weights).
"""

import numpy as np

from plenoctree_tpu.octree.renderer import VolumeRenderer, make_ndc_config
from plenoctree_tpu.ops.metrics import compute_psnr, compute_ssim
from plenoctree_tpu.utils.io import host0_tqdm


def eval_octree(tree, dataset, cfg, want_lpips=True, want_frames=False):
    """Returns (avg_psnr, avg_ssim, avg_lpips, frames)."""
    w, h, focal = dataset.w, dataset.h, dataset.focal
    if cfg.config is not None and "llff" in str(cfg.config) and not cfg.spherify:
        ndc_config = make_ndc_config(w, h, focal)
    else:
        ndc_config = None

    # Metrics default to the exact march oracle (per-ray hit ordering, svox
    # semantics); --fast_eval opts into the Pallas tile renderer — the
    # serving path, whose within-chunk ordering is mean-direction
    # approximate (fine for FPS, not for reported PSNR). NDC scenes serve
    # through the same path (TileRenderer(ndc=...): on-device NDC ray
    # conversion; quad-group masks go conservative).
    if getattr(cfg, "fast_eval", False):
        import jax
        from plenoctree_tpu.octree.tile_render import TileRenderer

        fast = not cfg.no_early_stop
        thr = 1e-2 if fast else 0.0
        mesh = None
        nshard = int(getattr(cfg, "shard_devices", 0) or 0)
        if nshard > 1:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()[:nshard]), ("data",))
        tile_r = TileRenderer(
            tree,
            step_size=cfg.renderer_step_size,
            sigma_thresh=thr,
            stop_thresh=thr,
            mesh=mesh,
            ndc=ndc_config,
        )

        def render(c2w):
            return tile_r.render_persp(c2w, h, w, focal)

    else:
        march_r = VolumeRenderer(
            tree,
            step_size=cfg.renderer_step_size,
            ndc=ndc_config,
            max_segments=getattr(cfg, "max_segments", 0) or None,
        )

        def render(c2w):
            return march_r.render_persp(
                c2w, height=h, width=w, fx=focal, fast=not cfg.no_early_stop
            )

    lpips_fn = None
    if want_lpips:
        from plenoctree_tpu.ops.lpips import get_lpips_fn

        lpips_fn = get_lpips_fn()

    avg_psnr, avg_ssim, avg_lpips = 0.0, 0.0, 0.0
    n_lpips = 0
    out_frames = []
    for idx in host0_tqdm(range(dataset.size)):
        c2w = dataset.camtoworlds[idx]
        im_gt = dataset.images[idx].reshape(h, w, -1)[..., :3]
        im = render(c2w)
        im = np.clip(im, 0.0, 1.0)

        mse = float(((im - im_gt) ** 2).mean())
        avg_psnr += float(compute_psnr(mse))
        avg_ssim += float(compute_ssim(im, im_gt, max_val=1.0))
        if lpips_fn is not None:
            avg_lpips += float(lpips_fn(im_gt, im))
            n_lpips += 1

        if want_frames:
            out_frames.append((im * 255).astype(np.uint8))

    avg_psnr /= dataset.size
    avg_ssim /= dataset.size
    avg_lpips = avg_lpips / n_lpips if n_lpips else float("nan")
    return avg_psnr, avg_ssim, avg_lpips, out_frames
