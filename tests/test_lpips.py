"""Pin the LPIPS-VGG architecture and exercise the metric with random weights.

The real pretrained weights are unavailable in-container (zero egress), so
these tests validate structure: the tapped relus must be torchvision
`features` indices {3, 8, 15, 22, 29} (relu1_2/2_2/3_3/4_3/5_3 — reference
metric octree/nerf/utils.py:461-486 uses the `lpips` package's VGG variant),
and the forward must run, be symmetric, and be zero on identical inputs.
"""

import numpy as np
import pytest

from plenoctree_tpu.ops import lpips as L


def test_tap_indices_match_lpips_vgg():
    taps = L.tap_structure()
    assert [t[0] for t in taps] == [3, 8, 15, 22, 29]
    assert [t[1] for t in taps] == [64, 128, 256, 512, 512]


def test_conv_count_is_vgg16():
    convs = [v for v in L._VGG_CFG if v != "M"]
    assert len(convs) == 13
    assert L._VGG_CFG.count("M") == 4  # pool5 comes after the last tap


def _random_weights(rng):
    w = {}
    cin = 3
    conv_i = 0
    for v in L._VGG_CFG:
        if v == "M":
            continue
        w[f"conv{conv_i}/kernel"] = rng.normal(size=(3, 3, cin, v)).astype(
            np.float32
        ) * 0.05
        w[f"conv{conv_i}/bias"] = np.zeros((v,), np.float32)
        cin = v
        conv_i += 1
    tap_channels = [t[1] for t in L.tap_structure()]
    for i, c in enumerate(tap_channels):
        w[f"lin{i}"] = rng.random(size=(c,)).astype(np.float32)
    return w


def test_forward_tap_shapes_and_metric_properties(rng):
    import jax.numpy as jnp

    w = _random_weights(rng)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1)
    feats = L._vgg_features(w, x)
    assert len(feats) == 5
    assert [f.shape for f in feats] == [
        (1, 64, 64, 64),
        (1, 32, 32, 128),
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 512),
    ]

    img0 = rng.random((32, 32, 3)).astype(np.float32)
    img1 = rng.random((32, 32, 3)).astype(np.float32)
    d00 = float(L._lpips_distance(w, img0, img0))
    d01 = float(L._lpips_distance(w, img0, img1))
    d10 = float(L._lpips_distance(w, img1, img0))
    assert d00 == pytest.approx(0.0, abs=1e-6)
    assert d01 > 1e-4
    assert d01 == pytest.approx(d10, rel=1e-5)


def test_get_lpips_fn_with_weights_file(rng, tmp_path, monkeypatch):
    w = _random_weights(rng)
    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **w)
    monkeypatch.setenv("LPIPS_WEIGHTS_NPZ", str(path))
    L.load_weights.cache_clear()
    try:
        fn = L.get_lpips_fn()
        assert fn is not None
        a = rng.random((16, 16, 3)).astype(np.float32)
        b = rng.random((16, 16, 3)).astype(np.float32)
        v = fn(a, b)
        assert np.isfinite(v) and v > 0
    finally:
        L.load_weights.cache_clear()
