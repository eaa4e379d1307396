"""LPIPS perceptual metric — JAX VGG16 port.

Replaces the reference's `lpips` torch package (octree/nerf/utils.py:461-486,
SURVEY.md §2.1). The network (VGG16 conv features + LPIPS linear heads) is
implemented in jnp; the pretrained weights cannot be downloaded in this
zero-egress container, so `get_lpips_fn()` loads them from
$LPIPS_WEIGHTS_NPZ (or plenoctree_tpu/data/lpips_vgg.npz) when present and
returns None otherwise — callers then report NaN for LPIPS, keeping
PSNR/SSIM parity unaffected.

Weights npz layout: conv kernels 'conv<i>/kernel' [kh,kw,cin,cout] (i = 0-based
conv index within torchvision VGG16 `features`), biases 'conv<i>/bias', LPIPS
linear heads 'lin<k>' [c]; a converter from the torch `lpips` package's
state_dict is provided (convert_torch_lpips; `python -m
plenoctree_tpu.ops.lpips out.npz` when torch+lpips with weights are present).
"""

import functools
import os

import numpy as np

# VGG16 conv structure in torchvision `features` order; 'M' = maxpool.
# LPIPS-VGG taps the relu outputs relu1_2/2_2/3_3/4_3/5_3, i.e. torchvision
# `features` indices {3, 8, 15, 22, 29}, which are the relus after the
# 2nd/4th/7th/10th/13th conv (1-based conv count).
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_TAP_AFTER = {2, 4, 7, 10, 13}  # 1-based conv count after whose relu we tap
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path():
    p = os.environ.get("LPIPS_WEIGHTS_NPZ")
    if p:
        return p
    return os.path.join(os.path.dirname(__file__), "..", "data", "lpips_vgg.npz")


@functools.lru_cache(maxsize=1)
def load_weights():
    path = _weights_path()
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: z[k] for k in z.files}


def _vgg_features(weights, x):
    """x: [N, H, W, 3] in [-1, 1] (LPIPS input convention)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = (x - _SHIFT) / _SCALE
    feats = []
    conv_i = 0
    for v in _VGG_CFG:
        if v == "M":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        k = jnp.asarray(weights[f"conv{conv_i}/kernel"])
        b = jnp.asarray(weights[f"conv{conv_i}/bias"])
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        x = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn) + b
        x = jax.nn.relu(x)
        conv_i += 1
        if conv_i in _TAP_AFTER:
            feats.append(x)
    return feats


def _lpips_distance(weights, img0, img1):
    import jax.numpy as jnp

    # [H, W, 3] in [0, 1] -> [1, H, W, 3] in [-1, 1].
    x0 = (jnp.asarray(img0)[None] * 2.0 - 1.0).astype(jnp.float32)
    x1 = (jnp.asarray(img1)[None] * 2.0 - 1.0).astype(jnp.float32)
    f0s = _vgg_features(weights, x0)
    f1s = _vgg_features(weights, x1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s)):
        n0 = f0 / jnp.sqrt(jnp.sum(f0**2, -1, keepdims=True) + 1e-10)
        n1 = f1 / jnp.sqrt(jnp.sum(f1**2, -1, keepdims=True) + 1e-10)
        diff = (n0 - n1) ** 2
        lin = jnp.asarray(weights[f"lin{i}"]).reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
    return total


def get_lpips_fn():
    """Returns lpips(img0, img1) -> float, or None if weights unavailable."""
    weights = load_weights()
    if weights is None:
        return None
    import jax

    dist = jax.jit(functools.partial(_lpips_distance, weights))
    return lambda a, b: float(dist(a, b))


def convert_torch_lpips(out_path):
    """Convert the torch `lpips` package's VGG weights to our npz layout.
    Requires torch + lpips installed with downloaded weights (not available
    in this container; provided for users who have them)."""
    import torch  # noqa
    import lpips as lpips_pkg  # noqa

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    conv_i = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 + model.net.slice4 + model.net.slice5:  # type: ignore
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}/kernel"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            out[f"conv{conv_i}/bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(model.lins):
        out[f"lin{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **out)
    return out_path


def tap_structure():
    """(torchvision_features_index, channels) for each tapped relu.

    Pure bookkeeping over _VGG_CFG/_TAP_AFTER so tests can pin the
    architecture against the documented LPIPS-VGG taps {3, 8, 15, 22, 29}.
    """
    taps = []
    feat_idx = 0  # index into torchvision vgg16().features
    conv_i = 0
    for v in _VGG_CFG:
        if v == "M":
            feat_idx += 1  # MaxPool2d
            continue
        conv_i += 1
        feat_idx += 2  # Conv2d + ReLU
        if conv_i in _TAP_AFTER:
            taps.append((feat_idx - 1, v))  # index of the ReLU just applied
    return taps


if __name__ == "__main__":
    import sys

    print(convert_torch_lpips(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz"))
