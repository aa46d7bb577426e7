"""Golden-value and property tests for the numerical core."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crnerf_tpu.core import (
    get_ray_directions,
    get_rays,
    get_ndc_rays,
    posenc,
    posenc_dims,
    stratified_zvals,
    perturb_zvals,
    sample_pdf,
    composite,
)
from crnerf_tpu.core.compositing import (
    compute_alphas,
    weights_from_alphas,
    DELTA_INF,
)
from crnerf_tpu.core.sampling import merge_sorted_zvals


# ---------------------------------------------------------------- rays
class TestRays:
    def test_directions_center_pixel(self):
        K = np.array([[100.0, 0, 4.0], [0, 100.0, 3.0], [0, 0, 1]], np.float32)
        d = get_ray_directions(6, 8, K)
        assert d.shape == (6, 8, 3)
        # pixel (i=cx, j=cy) looks straight down -z
        np.testing.assert_allclose(d[3, 4], [0.0, 0.0, -1.0], atol=1e-7)
        # +x increases with pixel i; y axis flipped (right-up-back)
        assert d[3, 5, 0] > 0 and d[4, 4, 1] < 0

    def test_get_rays_identity_pose(self):
        K = np.array([[10.0, 0, 1.0], [0, 10.0, 1.0], [0, 0, 1]], np.float32)
        dirs = get_ray_directions(2, 2, K)
        c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
        o, d = get_rays(dirs, c2w.astype(np.float32))
        assert o.shape == (4, 3) and d.shape == (4, 3)
        np.testing.assert_allclose(o, np.tile([1, 2, 3], (4, 1)), atol=1e-7)
        np.testing.assert_allclose(
            np.linalg.norm(d, axis=-1), np.ones(4), atol=1e-6
        )

    def test_get_rays_rotation(self):
        # 90deg rotation about y: camera -z maps to world -x
        R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
        c2w = np.concatenate([R, np.zeros((3, 1), np.float32)], 1)
        K = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
        dirs = np.array([[[0.0, 0.0, -1.0]]], np.float32)
        _, d = get_rays(dirs, c2w)
        np.testing.assert_allclose(d[0], [-1.0, 0.0, 0.0], atol=1e-7)

    def test_ndc_rays_shapes(self):
        o = np.array([[0.0, 0.0, -1.0]], np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        no, nd = get_ndc_rays(8, 8, 4.0, 1.0, o, d)
        assert no.shape == (1, 3) and nd.shape == (1, 3)
        # on-axis ray stays on-axis
        np.testing.assert_allclose(no[0, :2], [0, 0], atol=1e-6)


# ---------------------------------------------------------------- posenc
class TestPosenc:
    def test_dims(self):
        assert posenc_dims(15) == 93
        assert posenc_dims(4) == 27

    def test_golden_small(self):
        # N=2 freqs, max_logscale=1 -> freqs [1, 2]
        x = jnp.array([[0.5, -1.0, 2.0]])
        out = posenc(x, n_freqs=2, max_logscale=1)
        assert out.shape == (1, 3 + 3 * 4)
        expect = np.concatenate(
            [
                [0.5, -1.0, 2.0],
                np.sin([0.5, -1.0, 2.0]),
                np.cos([0.5, -1.0, 2.0]),
                np.sin([1.0, -2.0, 4.0]),
                np.cos([1.0, -2.0, 4.0]),
            ]
        )
        np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-6)

    def test_default_max_logscale_matches_reference(self):
        # reference instantiates PosEmbedding(N-1, N) (train…py:77-78)
        x = jnp.ones((4, 3)) * 0.1
        a = posenc(x, 15)
        b = posenc(x, 15, max_logscale=14)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_identity_channels_first(self):
        x = jnp.array([[0.3, 0.7, -0.2]])
        out = posenc(x, 4)
        np.testing.assert_allclose(np.asarray(out[0, :3]), [0.3, 0.7, -0.2])


# ---------------------------------------------------------------- z sampling
class TestZSampling:
    def test_linear_depth(self):
        near = jnp.array([[1.0], [2.0]])
        far = jnp.array([[5.0], [6.0]])
        z = stratified_zvals(near, far, 5)
        np.testing.assert_allclose(np.asarray(z[0]), [1, 2, 3, 4, 5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(z[1]), [2, 3, 4, 5, 6], atol=1e-6)

    def test_disparity(self):
        near = jnp.array([[1.0]])
        far = jnp.array([[4.0]])
        z = stratified_zvals(near, far, 3, use_disp=True)
        # disp linear: 1/z in [1, 0.25], mid = 0.625 -> z = 1.6
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], atol=1e-6)

    def test_perturb_within_bins(self):
        near = jnp.full((16, 1), 2.0)
        far = jnp.full((16, 1), 6.0)
        z = stratified_zvals(near, far, 64)
        zp = perturb_zvals(jax.random.key(0), z, 1.0)
        assert zp.shape == z.shape
        # perturbed samples stay inside [near, far] and monotone nondecreasing
        assert float(zp.min()) >= 2.0 - 1e-5
        assert float(zp.max()) <= 6.0 + 1e-5
        assert bool(jnp.all(zp[:, 1:] >= zp[:, :-1] - 1e-6))

    def test_perturb_zero_factor_is_identity_distribution(self):
        z = stratified_zvals(jnp.array([[0.0]]), jnp.array([[1.0]]), 8)
        zp = perturb_zvals(jax.random.key(1), z, 0.0)
        # with factor 0 every sample collapses to the bin lower edge
        lower = np.concatenate(
            [np.asarray(z[:, :1]), 0.5 * (np.asarray(z)[:, :-1] + np.asarray(z)[:, 1:])],
            -1,
        )
        np.testing.assert_allclose(np.asarray(zp), lower, atol=1e-6)


# ---------------------------------------------------------------- sample_pdf
class TestSamplePdf:
    def test_det_uniform_weights(self):
        # uniform weights -> det samples are evenly spaced across bins
        bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, 0)  # 8 bins
        w = jnp.ones((2, 8))
        s = sample_pdf(jax.random.key(0), bins, w, 5, det=True)
        np.testing.assert_allclose(
            np.asarray(s[0]), [0.0, 0.25, 0.5, 0.75, 1.0], atol=1e-5
        )

    def test_concentrated_weight(self):
        # all weight in bin 2 of 4 -> all samples inside that bin
        bins = jnp.array([[0.0, 1.0, 2.0, 3.0, 4.0]])
        w = jnp.array([[0.0, 0.0, 10.0, 0.0]])
        s = sample_pdf(jax.random.key(0), bins, w, 16, det=False)
        sv = np.asarray(s)
        assert (sv >= 2.0 - 1e-3).all() and (sv <= 3.0 + 1e-3).all()

    def test_monotone_when_det(self):
        bins = jnp.sort(jax.random.uniform(jax.random.key(2), (4, 17)), -1)
        w = jax.random.uniform(jax.random.key(3), (4, 16))
        s = sample_pdf(jax.random.key(0), bins, w, 32, det=True)
        assert bool(jnp.all(s[:, 1:] >= s[:, :-1] - 1e-6))

    def test_samples_in_range(self):
        bins = jnp.linspace(2.0, 6.0, 64)[None].repeat(8, 0)
        w = jax.random.uniform(jax.random.key(4), (8, 63))
        s = sample_pdf(jax.random.key(5), bins, w, 64, det=False)
        assert float(s.min()) >= 2.0 - 1e-5 and float(s.max()) <= 6.0 + 1e-5

    def test_matches_torch_reference_semantics(self):
        """Independent numpy re-derivation of the reference algorithm
        (rendering.py:7-46) on a fixed case."""
        rng = np.random.RandomState(0)
        bins = np.sort(rng.rand(3, 9).astype(np.float32), -1)
        w = rng.rand(3, 8).astype(np.float32)
        n_imp, eps = 6, 1e-5
        wq = w + eps
        pdf = wq / wq.sum(-1, keepdims=True)
        cdf = np.concatenate(
            [np.zeros((3, 1), np.float32), np.cumsum(pdf, -1)], -1
        )
        u = np.linspace(0, 1, n_imp, dtype=np.float32)
        u = np.tile(u, (3, 1))
        inds = np.stack([
            np.searchsorted(cdf[i], u[i], side="right") for i in range(3)
        ])
        below = np.clip(inds - 1, 0, None)
        above = np.clip(inds, None, 8)
        cg0 = np.take_along_axis(cdf, below, 1)
        cg1 = np.take_along_axis(cdf, above, 1)
        bg0 = np.take_along_axis(bins, below, 1)
        bg1 = np.take_along_axis(bins, above, 1)
        denom = cg1 - cg0
        denom[denom < eps] = 1
        expect = bg0 + (u - cg0) / denom * (bg1 - bg0)

        got = sample_pdf(
            jax.random.key(0), jnp.asarray(bins), jnp.asarray(w), n_imp,
            det=True,
        )
        np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)

    def test_maskreduce_impl_matches_onehot(self):
        """The fused masked-reduce realization equals the one-hot MXU
        realization bitwise-close on every edge: det (u hits 0 and 1
        exactly), stochastic draws, near-zero weights (denom<eps guard),
        and weight mass at the ends (empty suffix -> clip-to-B)."""
        cases = []
        rng = np.random.RandomState(11)
        bins64 = np.sort(rng.rand(16, 64).astype(np.float32) * 4 + 2, -1)
        cases.append((bins64, rng.rand(16, 63).astype(np.float32), 64))
        w_zero = np.zeros((4, 63), np.float32)      # pure-eps pdf
        cases.append((bins64[:4], w_zero, 64))
        w_ends = np.zeros((4, 63), np.float32)      # all mass at the ends
        w_ends[:, 0] = 5.0
        w_ends[:, -1] = 5.0
        cases.append((bins64[:4], w_ends, 32))
        for det in (True, False):
            for bins, w, n_imp in cases:
                a = sample_pdf(jax.random.key(3), jnp.asarray(bins),
                               jnp.asarray(w), n_imp, det=det,
                               impl="onehot")
                b = sample_pdf(jax.random.key(3), jnp.asarray(bins),
                               jnp.asarray(w), n_imp, det=det,
                               impl="maskreduce")
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6,
                    err_msg=f"det={det} shape={w.shape}",
                )

    def test_merge_sorted(self):
        a = jnp.array([[1.0, 3.0, 5.0]])
        b = jnp.array([[2.0, 4.0]])
        np.testing.assert_allclose(
            np.asarray(merge_sorted_zvals(a, b)[0]), [1, 2, 3, 4, 5]
        )

    def test_stochastic_draws_sorted_and_uniform(self):
        """Non-det samples are ascending per ray (sorted-uniform draws)
        and match the iid-uniform order-statistics distribution."""
        bins = jnp.linspace(0.0, 1.0, 65)[None].repeat(2000, 0)
        w = jnp.ones((2000, 64))
        s = sample_pdf(jax.random.key(7), bins, w, 64, det=False)
        sv = np.asarray(s)
        assert (np.diff(sv, axis=-1) >= -1e-6).all()
        # with uniform weights the inverse CDF is identity: samples are
        # sorted U[0,1); their pooled distribution must be uniform
        flat = np.sort(sv.ravel())
        grid = np.linspace(0, 1, flat.size)
        assert np.abs(flat - grid).max() < 0.01  # KS-style bound
        # k-th order statistic of 64 uniforms has mean k/65
        means = sv.mean(0)
        expect = np.arange(1, 65) / 65.0
        assert np.abs(means - expect).max() < 0.01

    def test_bitonic_merge_matches_sort(self):
        """Power-of-2 total -> bitonic merge path == full sort."""
        a = jnp.sort(jax.random.uniform(jax.random.key(0), (37, 64)), -1)
        b = jnp.sort(jax.random.uniform(jax.random.key(1), (37, 64)), -1)
        got = merge_sorted_zvals(a, b)
        want = jnp.sort(jnp.concatenate([a, b], -1), -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_merge_unsorted_inputs_fallback(self):
        """perturb > 1 can leave z_coarse unsorted; inputs_sorted=False
        must still return the sorted union (lax.sort fallback)."""
        a = jax.random.uniform(jax.random.key(2), (9, 64))  # unsorted
        b = jnp.sort(jax.random.uniform(jax.random.key(3), (9, 64)), -1)
        got = merge_sorted_zvals(a, b, inputs_sorted=False)
        want = jnp.sort(jnp.concatenate([a, b], -1), -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------- compositing
class TestCompositing:
    def test_alphas_golden(self):
        z = jnp.array([[1.0, 2.0, 4.0]])
        sig = jnp.array([[0.5, -1.0, 2.0]])  # relu kills the -1
        a = compute_alphas(sig, z)
        # deltas = [1, 2, 1e2]
        expect = 1 - np.exp(-np.array([1, 2, DELTA_INF]) * np.array([0.5, 0, 2.0]))
        np.testing.assert_allclose(np.asarray(a[0]), expect, atol=1e-6)

    def test_weights_exclusive_cumprod(self):
        a = jnp.array([[0.5, 0.5, 1.0]])
        w = weights_from_alphas(a)
        np.testing.assert_allclose(np.asarray(w[0]), [0.5, 0.25, 0.25], atol=1e-6)

    def test_weights_sum_le_one(self):
        key = jax.random.key(0)
        sig = jax.random.uniform(key, (32, 64)) * 5
        z = jnp.sort(jax.random.uniform(jax.random.key(1), (32, 64)) * 4 + 1, -1)
        a = compute_alphas(sig, z)
        w = weights_from_alphas(a)
        assert float(jnp.max(jnp.sum(w, -1))) <= 1.0 + 1e-5

    def test_composite_opaque_surface(self):
        # huge sigma at sample 1 -> feature == that sample's feature,
        # depth == its z
        feat = jnp.zeros((1, 3, 4)).at[0, 1].set(jnp.array([1.0, 2.0, 3.0, 4.0]))
        sig = jnp.array([[0.0, 1e6, 0.0]])
        z = jnp.array([[1.0, 2.0, 3.0]])
        w, f, d = composite(feat, sig, z)
        np.testing.assert_allclose(np.asarray(f[0]), [1, 2, 3, 4], atol=1e-5)
        np.testing.assert_allclose(float(d[0]), 2.0, atol=1e-5)

    def test_depth_within_bounds(self):
        sig = jax.random.uniform(jax.random.key(0), (16, 64)) * 50
        z = jnp.sort(
            jax.random.uniform(jax.random.key(1), (16, 64)) * 3 + 2, -1
        )
        feat = jnp.ones((16, 64, 8))
        _, _, d = composite(feat, sig, z)
        assert float(d.min()) >= 0.0
        assert float(d.max()) <= float(z.max()) + 1e-4

    def test_noise_requires_key(self):
        sig = jnp.ones((1, 4))
        z = jnp.linspace(1, 2, 4)[None]
        with pytest.raises(ValueError):
            compute_alphas(sig, z, noise_std=1.0, key=None)
