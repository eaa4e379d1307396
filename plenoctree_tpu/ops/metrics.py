"""Image quality metrics: PSNR and a tf.image.ssim-compatible SSIM.

Behavior parity: nerf_sh/nerf/utils.py:384-393 (compute_psnr) and :396-466
(compute_ssim, separable-Gaussian formulation). SSIM is implemented with two
1-D depthwise convolutions via lax.conv_general_dilated rather than
vmap(convolve2d) - same "valid" windowing and constants, but a single fused
conv per axis which compiles efficiently on both TPU and the CPU backend the
reference deliberately used for accuracy (train.py:172-173).
"""

import jax.numpy as jnp
from jax import lax


def compute_psnr(mse):
    """PSNR assuming max pixel value 1.0."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def _gaussian_filter(filter_size, filter_sigma, dtype):
    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((jnp.arange(filter_size, dtype=dtype) - hw + shift) / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    return filt / jnp.sum(filt)


def compute_ssim(
    img0,
    img1,
    max_val,
    filter_size=11,
    filter_sigma=1.5,
    k1=0.01,
    k2=0.03,
    return_map=False,
):
    """SSIM between two images [..., H, W, C], modeled after tf.image.ssim."""
    dtype = jnp.result_type(img0.dtype, jnp.float32)
    img0 = img0.astype(dtype)
    img1 = img1.astype(dtype)
    filt = _gaussian_filter(filter_size, filter_sigma, dtype)

    batch_shape = img0.shape[:-3]
    h, w, c = img0.shape[-3:]

    def blur(z):
        # z: [..., H, W, C] -> NHWC depthwise separable blur, "valid" padding.
        zb = z.reshape((-1, h, w, c))
        kern_h = jnp.tile(filt.reshape(filter_size, 1, 1, 1), (1, 1, 1, c))
        kern_w = jnp.tile(filt.reshape(1, filter_size, 1, 1), (1, 1, 1, c))
        dn = lax.conv_dimension_numbers(zb.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
        zb = lax.conv_general_dilated(
            zb, kern_h, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        zb = lax.conv_general_dilated(
            zb, kern_w, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )
        return zb.reshape(batch_shape + zb.shape[1:])

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = blur(img0**2) - mu00
    sigma11 = blur(img1**2) - mu11
    sigma01 = blur(img0 * img1) - mu01

    sigma00 = jnp.maximum(0.0, sigma00)
    sigma11 = jnp.maximum(0.0, sigma11)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(
        jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01)
    )

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    if return_map:
        return ssim_map
    return jnp.mean(ssim_map, axis=tuple(range(len(batch_shape), ssim_map.ndim)))
