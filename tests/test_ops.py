"""Unit tests for core math ops against analytic values and reference
semantics (posenc, SH/SG bases, sampling, compositing, metrics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from plenoctree_tpu.ops import (
    add_gaussian_noise,
    compute_psnr,
    compute_ssim,
    eval_sg,
    eval_sh,
    piecewise_constant_pdf,
    posenc,
    sample_along_rays,
    sample_pdf,
    sh_basis,
    volumetric_rendering,
)
from plenoctree_tpu.ops.sg import euler2mat, spher2cart


class TestPosenc:
    def test_identity_when_degenerate(self):
        x = jnp.ones((4, 3))
        assert posenc(x, 2, 2).shape == (4, 3)

    def test_shape(self):
        x = jnp.ones((5, 7, 3))
        out = posenc(x, 0, 10)
        assert out.shape == (5, 7, 3 + 2 * 3 * 10)

    def test_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        out = np.asarray(posenc(x, 0, 2))
        # Layout: [x, sin(2^0 x), sin(2^1 x), cos(2^0 x), cos(2^1 x)] blocked.
        np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0], atol=1e-6)
        np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 6:9], np.sin([1.0, -0.5, 2.0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 9:12], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 12:15], np.cos([1.0, -0.5, 2.0]), atol=1e-6)

    def test_legacy_order_interleaves(self):
        x = jnp.array([[0.3, 0.7, -0.2]])
        out = np.asarray(posenc(x, 0, 3, legacy_posenc_order=True))
        # Per frequency f: [sin(f x), cos(f x)] blocks of width 3.
        np.testing.assert_allclose(out[0, 3:6], np.sin([0.3, 0.7, -0.2]), atol=1e-6)
        np.testing.assert_allclose(out[0, 6:9], np.cos([0.3, 0.7, -0.2]), atol=1e-6)
        np.testing.assert_allclose(out[0, 9:12], np.sin([0.6, 1.4, -0.4]), atol=1e-6)


class TestSH:
    def test_deg0_constant(self):
        dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        b = np.asarray(sh_basis(0, dirs))
        np.testing.assert_allclose(b, 0.28209479177387814, atol=1e-7)

    def test_orthonormality(self, rng):
        # Monte-Carlo check: integral over sphere of b_i b_j ~ delta_ij.
        n = 80_000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        b = np.asarray(sh_basis(3, jnp.asarray(v)))
        gram = (b.T @ b) * (4 * np.pi / n)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_eval_sh_matches_manual_contraction(self, deg, rng):
        k = (deg + 1) ** 2
        sh = jnp.asarray(rng.normal(size=(6, 3, k)).astype(np.float32))
        dirs = rng.normal(size=(6, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = np.asarray(eval_sh(deg, sh, jnp.asarray(dirs)))
        b = np.asarray(sh_basis(deg, jnp.asarray(dirs)))
        np.testing.assert_allclose(out, np.einsum("bck,bk->bc", np.asarray(sh), b), rtol=2e-5, atol=2e-5)

    def test_deg1_signs_match_reference_convention(self):
        # Reference (nerf_sh/nerf/sh.py:76-79): result = C0*sh0 - C1*y*sh1
        # + C1*z*sh2 - C1*x*sh3.
        d = np.array([0.3, -0.6, 0.9])
        d = d / np.linalg.norm(d)
        b = np.asarray(sh_basis(1, jnp.asarray(d)))
        C0, C1 = 0.28209479177387814, 0.4886025119029199
        np.testing.assert_allclose(
            b, [C0, -C1 * d[1], C1 * d[2], -C1 * d[0]], atol=1e-7
        )


class TestSG:
    def test_spher2cart_unit(self):
        out = np.asarray(spher2cart(1.0, jnp.asarray(np.pi / 2), jnp.asarray(0.0)))
        np.testing.assert_allclose(out, [1.0, 0.0, 0.0], atol=1e-6)

    def test_eval_sg_peak_at_lobe(self):
        # A single sharp lobe pointing at +z: response at +z is coeff/N
        # (softplus(lam)*(1-1)=0 -> exp(0)=1), and much smaller away.
        lam = jnp.asarray([10.0])
        mu = jnp.asarray([[0.0, 0.0]])  # theta=0 -> +z
        coeffs = jnp.asarray([[[2.0]]])  # [..., C=1, N=1]
        on = np.asarray(eval_sg(lam, mu, coeffs, jnp.asarray([[0.0, 0.0, 1.0]])))
        off = np.asarray(eval_sg(lam, mu, coeffs, jnp.asarray([[0.0, 0.0, -1.0]])))
        np.testing.assert_allclose(on, 2.0, atol=1e-5)
        assert abs(off[0, 0]) < 1e-6

    def test_euler2mat_is_rotation(self, rng):
        ang = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        mats = np.asarray(euler2mat(ang))
        eye = np.einsum("bij,bkj->bik", mats, mats)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (5, 1, 1)), atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=1e-4)


class TestSampling:
    def test_stratified_deterministic(self):
        origins = jnp.zeros((2, 3))
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        z, pts = sample_along_rays(
            random.PRNGKey(0), origins, dirs, 5, 2.0, 6.0, False, False
        )
        np.testing.assert_allclose(np.asarray(z[0]), [2, 3, 4, 5, 6], atol=1e-6)
        np.testing.assert_allclose(np.asarray(pts[0, :, 2]), [2, 3, 4, 5, 6], atol=1e-6)

    def test_stratified_randomized_in_bins(self):
        origins = jnp.zeros((16, 3))
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
        z, _ = sample_along_rays(
            random.PRNGKey(1), origins, dirs, 8, 1.0, 9.0, True, False
        )
        z = np.asarray(z)
        assert (z >= 1.0 - 1e-5).all() and (z <= 9.0 + 1e-5).all()
        assert (np.diff(z, axis=-1) > -1e-6).all()  # sorted within each ray

    def test_lindisp(self):
        origins = jnp.zeros((1, 3))
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        z, _ = sample_along_rays(
            random.PRNGKey(0), origins, dirs, 3, 1.0, 4.0, False, True
        )
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], atol=1e-5)

    def test_pdf_sampling_statistics(self):
        # All mass in bin [2, 3): nearly all samples should land there.
        bins = jnp.tile(jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]]), (4, 1))
        weights = jnp.tile(jnp.asarray([[0.0, 0.0, 100.0, 0.0]]), (4, 1))
        s = np.asarray(
            piecewise_constant_pdf(random.PRNGKey(0), bins, weights, 128, True)
        )
        frac = ((s >= 2.0) & (s <= 3.0)).mean()
        assert frac > 0.95

    def test_pdf_deterministic_spans_bins(self):
        bins = jnp.asarray([[0.0, 1.0, 2.0]])
        weights = jnp.asarray([[1.0, 1.0]])
        s = np.asarray(piecewise_constant_pdf(random.PRNGKey(0), bins, weights, 9, False))
        np.testing.assert_allclose(s[0], np.linspace(0, 2, 9), atol=1e-4)

    def test_pdf_zero_weights_no_nan(self):
        bins = jnp.asarray([[0.0, 1.0, 2.0]])
        weights = jnp.zeros((1, 2))
        s = np.asarray(piecewise_constant_pdf(random.PRNGKey(0), bins, weights, 7, True))
        assert np.isfinite(s).all()

    def test_sample_pdf_merges_sorted(self):
        origins = jnp.zeros((1, 3))
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        z_coarse = jnp.asarray([[1.0, 2.0, 3.0]])
        bins = jnp.asarray([[1.0, 2.0, 3.0]])
        weights = jnp.asarray([[1.0, 1.0]])
        z, pts = sample_pdf(
            random.PRNGKey(0), bins, weights, origins, dirs, z_coarse, 4, True
        )
        assert z.shape == (1, 7)
        assert pts.shape == (1, 7, 3)
        z = np.asarray(z)
        assert (np.diff(z, axis=-1) >= 0).all()


    def test_noise_disabled_paths(self):
        raw = jnp.ones((3, 2))
        assert (np.asarray(add_gaussian_noise(random.PRNGKey(0), raw, None, True)) == 1).all()
        assert (np.asarray(add_gaussian_noise(random.PRNGKey(0), raw, 1.0, False)) == 1).all()
        noised = np.asarray(add_gaussian_noise(random.PRNGKey(0), raw, 1.0, True))
        assert not np.allclose(noised, 1.0)


class TestVolumetricRendering:
    def test_opaque_first_sample(self):
        # A very dense first sample: ray color ~= first sample color.
        rgb = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
        sigma = jnp.asarray([[[1e9], [1e9]]])
        z = jnp.asarray([[1.0, 2.0]])
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        comp, _, acc, w = volumetric_rendering(rgb, sigma, z, dirs, False)
        np.testing.assert_allclose(np.asarray(comp[0]), [1.0, 0.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w[0]), [1.0, 0.0], atol=1e-5)

    def test_empty_space_white_background(self):
        rgb = jnp.zeros((1, 4, 3))
        sigma = jnp.zeros((1, 4, 1))
        z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        comp, _, acc, _ = volumetric_rendering(rgb, sigma, z, dirs, True)
        np.testing.assert_allclose(np.asarray(comp[0]), [1.0, 1.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc[0]), 0.0, atol=1e-6)

    def test_matches_hand_rolled_compositing(self, rng):
        b, s = 3, 8
        rgb = jnp.asarray(rng.uniform(size=(b, s, 3)).astype(np.float32))
        sigma = jnp.asarray(rng.uniform(size=(b, s, 1)).astype(np.float32) * 3)
        z = jnp.sort(jnp.asarray(rng.uniform(1, 5, size=(b, s)).astype(np.float32)), axis=-1)
        dirs = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
        comp, _, acc, w = volumetric_rendering(rgb, sigma, z, dirs, False)

        # Hand-rolled loop version.
        rgbn, sn, zn, dn = map(np.asarray, (rgb, sigma, z, dirs))
        dist = np.concatenate([zn[:, 1:] - zn[:, :-1], np.full((b, 1), 1e10)], -1)
        dist = dist * np.linalg.norm(dn, axis=-1, keepdims=True)
        alpha = 1 - np.exp(-sn[..., 0] * dist)
        exp_w = np.zeros((b, s))
        for i in range(b):
            t = 1.0
            for j in range(s):
                exp_w[i, j] = alpha[i, j] * t
                t *= 1 - alpha[i, j] + 1e-10
        np.testing.assert_allclose(np.asarray(w), exp_w, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(comp), (exp_w[..., None] * rgbn).sum(1), atol=1e-5
        )

    def test_dir_norm_scales_distances(self):
        rgb = jnp.ones((1, 2, 3)) * 0.5
        sigma = jnp.ones((1, 2, 1))
        z = jnp.asarray([[1.0, 2.0]])
        d1 = jnp.asarray([[0.0, 0.0, 1.0]])
        d2 = jnp.asarray([[0.0, 0.0, 2.0]])
        _, _, _, w1 = volumetric_rendering(rgb, sigma, z, d1, False)
        _, _, _, w2 = volumetric_rendering(rgb, sigma, z, d2, False)
        np.testing.assert_allclose(
            np.asarray(w2[0, 0]), 1 - (1 - np.asarray(w1[0, 0])) ** 2, atol=1e-5
        )


class TestMetrics:
    def test_psnr(self):
        np.testing.assert_allclose(float(compute_psnr(jnp.asarray(0.01))), 20.0, atol=1e-5)

    def test_ssim_identical_images(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        assert float(compute_ssim(img, img, max_val=1.0)) > 0.999

    def test_ssim_noise_lowers_score(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        noisy = img + jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32)) * 0.3
        assert float(compute_ssim(img, noisy, max_val=1.0)) < 0.7

    def test_ssim_batched(self, rng):
        imgs = jnp.asarray(rng.uniform(size=(2, 24, 24, 3)).astype(np.float32))
        out = compute_ssim(imgs, imgs, max_val=1.0)
        assert out.shape == (2,)

    def test_ssim_matches_separable_convolve_reference(self, rng):
        # Cross-check our conv-based blur against a scipy separable blur
        # implementation of the same SSIM definition.
        import scipy.signal

        img0 = rng.uniform(size=(20, 20, 1)).astype(np.float32)
        img1 = rng.uniform(size=(20, 20, 1)).astype(np.float32)
        ours = float(compute_ssim(jnp.asarray(img0), jnp.asarray(img1), max_val=1.0))

        hw = 11 // 2
        f_i = ((np.arange(11) - hw) / 1.5) ** 2
        filt = np.exp(-0.5 * f_i)
        filt /= filt.sum()

        def blur(z):
            z = z[..., 0]
            z = scipy.signal.convolve2d(z, filt[:, None], mode="valid")
            z = scipy.signal.convolve2d(z, filt[None, :], mode="valid")
            return z

        mu0, mu1 = blur(img0), blur(img1)
        s00 = blur(img0**2) - mu0**2
        s11 = blur(img1**2) - mu1**2
        s01 = blur(img0 * img1) - mu0 * mu1
        s00, s11 = np.maximum(0, s00), np.maximum(0, s11)
        s01 = np.sign(s01) * np.minimum(np.sqrt(s00 * s11), np.abs(s01))
        c1, c2 = 0.01**2, 0.03**2
        ssim = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
            (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
        )
        np.testing.assert_allclose(ours, ssim.mean(), atol=1e-4)
