"""Shape/behavior tests for the flax model zoo + torch cross-checks for the
tricky layout ops (pixel shuffle, adaptive pool)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crnerf_tpu.models import (
    AppearanceEncoder,
    ContextGuidedNetwork,
    Decoder3,
    EAttr,
    Encoder3,
    GramCNN,
    ImplicitMask,
    NerfMLP,
    NerfTanhMLP,
    NerfWMLP,
    NeuralRenderer,
    RRDBNet,
    StyleNet,
    StyleTransform,
    get_renderer,
)
from crnerf_tpu.models.common import (
    adaptive_avg_pool2d,
    max_pool_2x2,
    pixel_shuffle,
    resize_bilinear,
    sample_bilinear_uv,
)

KEY = jax.random.key(0)


class TestNerfMLP:
    def test_output_shape_and_ranges(self):
        m = NerfMLP()
        xyz = jax.random.normal(KEY, (32, 93))
        dirs = jax.random.normal(jax.random.key(1), (32, 27))
        params = m.init(KEY, xyz, dirs)
        out = m.apply(params, xyz, dirs)
        assert out.shape == (32, 65)
        feat, sigma = out[:, :64], out[:, 64]
        assert float(feat.min()) >= 0 and float(feat.max()) <= 1  # sigmoid
        assert float(sigma.min()) >= 0  # softplus

    def test_sigma_only(self):
        m = NerfMLP()
        xyz = jax.random.normal(KEY, (8, 93))
        dirs = jnp.zeros((8, 27))
        params = m.init(KEY, xyz, dirs)
        s = m.apply(params, xyz, dirs, sigma_only=True)
        full = m.apply(params, xyz, dirs)
        np.testing.assert_allclose(
            np.asarray(s[:, 0]), np.asarray(full[:, 64]), atol=1e-6
        )

    def test_param_count_close_to_reference(self):
        # reference NeRF_sigma: ~0.6M params
        m = NerfMLP()
        params = m.init(KEY, jnp.zeros((1, 93)), jnp.zeros((1, 27)))
        n = sum(x.size for x in jax.tree.leaves(params))
        # 8x256 trunk + skip + heads
        assert 550_000 < n < 700_000

    def test_skip_connection_changes_width(self):
        """Layer 5 (index 4) consumes W+93 inputs."""
        m = NerfMLP()
        params = m.init(KEY, jnp.zeros((1, 93)), jnp.zeros((1, 27)))
        k5 = params["params"]["xyz_encoding_5"]["kernel"]
        assert k5.shape == (256 + 93, 256)

    def test_variants(self):
        xyz = jax.random.normal(KEY, (4, 93))
        dirs = jax.random.normal(KEY, (4, 27))
        mt = NerfTanhMLP()
        pt = mt.init(KEY, xyz, dirs)
        out = mt.apply(pt, xyz, dirs)
        assert out.shape == (4, 65)
        assert float(out[:, :64].min()) >= -1

        mw = NerfWMLP()
        a = jax.random.normal(KEY, (4, 48))
        pw = mw.init(KEY, xyz, dirs, a, a)
        outw = mw.apply(pw, xyz, dirs, a, a)
        assert outw.shape == (4, 6)  # static rgb + random rgb


class TestLayoutOps:
    def test_pixel_shuffle_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(0).rand(2, 3, 4, 16).astype(np.float32)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.nn.functional.pixel_shuffle(tx, 2).permute(0, 2, 3, 1)
        np.testing.assert_allclose(got, want.numpy(), atol=1e-6)

    def test_adaptive_pool_matches_torch(self):
        torch = pytest.importorskip("torch")
        for hw in [(37, 53), (32, 32), (100, 64)]:
            x = np.random.RandomState(1).rand(1, *hw, 5).astype(np.float32)
            got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (32, 32)))
            tx = torch.from_numpy(x).permute(0, 3, 1, 2)
            want = torch.nn.functional.adaptive_avg_pool2d(tx, 32)
            np.testing.assert_allclose(
                got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5
            )

    def test_max_pool_floor(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(2).rand(1, 7, 9, 3).astype(np.float32)
        got = np.asarray(max_pool_2x2(jnp.asarray(x)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.nn.functional.max_pool2d(tx, 2, 2)
        np.testing.assert_allclose(
            got, want.permute(0, 2, 3, 1).numpy(), atol=1e-6
        )

    def test_resize_bilinear_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(3).rand(1, 8, 12, 2).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.asarray(x), (17, 23)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.nn.functional.interpolate(
            tx, size=(17, 23), mode="bilinear", align_corners=False
        )
        np.testing.assert_allclose(
            got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5
        )

    def test_sample_bilinear_uv_equals_interpolate_then_index(self):
        """The TPU-native gather-at-uv must equal the reference's
        interpolate-to-full-res + flat-index on grid-sampled pixels."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(4)
        low = rng.rand(9, 13, 1).astype(np.float32)
        H, W = 41, 57
        # grid-sampled pixels: normalized coords flooring to (h, w)
        hs = np.array([0, 5, 17, 40])
        ws = np.array([0, 3, 30, 56])
        # uv at the *center* of the chosen pixel
        uv = np.stack([(hs + 0.5) / H, (ws + 0.5) / W], -1).astype(np.float32)
        got = np.asarray(
            sample_bilinear_uv(jnp.asarray(low), jnp.asarray(uv))
        )[:, 0]
        t = torch.from_numpy(low).permute(2, 0, 1)[None]
        full = torch.nn.functional.interpolate(
            t, size=(H, W), mode="bilinear", align_corners=False
        )[0, 0].numpy()
        want = full[hs, ws]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAppearance:
    def test_encoder_output_shape(self):
        m = AppearanceEncoder(out_channel=64)
        x = jax.random.uniform(KEY, (1, 160, 224, 3))
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == (1, 32, 32, 64)

    def test_encoder_various_input_sizes(self):
        m = AppearanceEncoder(out_channel=64)
        x0 = jax.random.uniform(KEY, (1, 96, 128, 3))
        params = m.init(KEY, x0)
        for hw in [(96, 128), (130, 170)]:
            out = m.apply(params, jax.random.uniform(KEY, (1, *hw, 3)))
            assert out.shape == (1, 32, 32, 64)

    def test_encoder_s2d_schedule_identical(self):
        """s2d=True is the SAME function (params, math) on even-sized maps
        — only the MXU schedule differs (models/common.py s2d_conv3x3).
        Params initialized under one variant drive the other; outputs and
        parameter gradients must agree."""
        import jax.numpy as jnp

        m0 = AppearanceEncoder(out_channel=64)
        m1 = AppearanceEncoder(out_channel=64, s2d=True)
        x = jax.random.uniform(KEY, (2, 96, 128, 3))
        params = m0.init(KEY, x)
        # identical param trees (names + shapes)
        p1 = m1.init(KEY, x)
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(
            jnp.shape, p1
        )
        out0 = m0.apply(params, x)
        out1 = m1.apply(params, x)
        np.testing.assert_allclose(out0, out1, atol=2e-5)
        g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, x) ** 2))(params)
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x) ** 2))(params)
        # fp reassociation can flip a maxpool argmax / leaky boundary and
        # reroute the gradient at isolated pixels, so allow a tiny outlier
        # fraction; the single-layer fwd/dgrad/wgrad exactness is pinned at
        # 1e-4/1e-3 in scripts/spike_s2d.py check_exact
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            rel_fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
            assert rel_fro < 1e-3, rel_fro
            bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
            assert bad.mean() < 1e-3, bad.mean()
        # odd input sizes fall back to the plain conv path
        xo = jax.random.uniform(KEY, (1, 91, 125, 3))
        np.testing.assert_allclose(
            m0.apply(params, xo), m1.apply(params, xo), atol=2e-5
        )

    def test_encoder_s2d_stack_schedule_identical(self):
        """s2d_stack=True (whole-stack packed schedule: packed halos,
        cross-phase-max pools) is the SAME function as the plain encoder
        on %4-sized maps — params initialized under one variant drive the
        other; outputs and parameter gradients must agree."""
        import jax.numpy as jnp

        m0 = AppearanceEncoder(out_channel=64)
        m1 = AppearanceEncoder(out_channel=64, s2d_stack=True)
        x = jax.random.uniform(KEY, (2, 96, 128, 3))
        params = m0.init(KEY, x)
        p1 = m1.init(KEY, x)
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(
            jnp.shape, p1
        )
        out0 = m0.apply(params, x)
        out1 = m1.apply(params, x)
        np.testing.assert_allclose(out0, out1, atol=2e-5)
        g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, x) ** 2))(params)
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x) ** 2))(params)
        # same outlier policy as the per-conv s2d test above: fp
        # reassociation can flip a maxpool argmax at isolated pixels
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            rel_fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
            assert rel_fro < 1e-3, rel_fro
            bad = np.abs(a - b) > 1e-2 + 1e-2 * np.abs(b)
            assert bad.mean() < 1e-3, bad.mean()
        # non-%4 input sizes fall back to the plain schedule
        xo = jax.random.uniform(KEY, (1, 91, 125, 3))
        np.testing.assert_allclose(
            m0.apply(params, xo), m1.apply(params, xo), atol=2e-5
        )

    def test_packed_reflect_pad_matches_original_space(self):
        """packed_reflect_pad1(_s2d(x)) == _s2d(reflect_pad(x, 1)) — the
        phase-shift re-pairing is exactly the packed padded image."""
        from crnerf_tpu.models.common import (
            _s2d, packed_reflect_pad1, reflect_pad,
        )

        x = jax.random.uniform(KEY, (2, 8, 12, 5))
        np.testing.assert_array_equal(
            packed_reflect_pad1(_s2d(x)), _s2d(reflect_pad(x, 1))
        )

    def test_legacy_encoder3_decoder3(self):
        e = Encoder3()
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        pe = e.init(KEY, x)
        feat = e.apply(pe, x)
        assert feat.shape == (1, 16, 16, 64)
        d = Decoder3()
        pd = d.init(KEY, feat)
        out = d.apply(pd, feat)
        assert out.shape == (1, 64, 64, 3)


class TestStyle:
    def test_gram_cnn(self):
        m = GramCNN(32, 64)
        x = jax.random.normal(KEY, (2, 32, 32, 64))
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == (2, 1024)

    def test_style_transform(self):
        m = StyleTransform(32, 64)
        c = jax.random.normal(KEY, (1, 32, 32, 64))
        s = jax.random.normal(jax.random.key(1), (1, 32, 32, 64))
        params = m.init(KEY, c, s)
        out, tm = m.apply(params, c, s)
        assert out.shape == (1, 32, 32, 64)
        assert tm.shape == (1, 32, 32)

    def test_style_net_both_paths(self):
        m = StyleNet(nerf_out_dim=64)
        c = jax.random.normal(KEY, (1, 32, 32, 64))
        s = jax.random.normal(jax.random.key(1), (1, 32, 32, 64))
        params = m.init(KEY, c, s)
        rgb = m.apply(params, c, s)
        assert rgb.shape == (1, 32, 32, 3)
        assert 0 <= float(rgb.min()) and float(rgb.max()) <= 1
        content = m.apply(params, c, None, kind="content")
        assert content.shape == (1, 32, 32, 3)


class TestDecoder:
    def test_degenerate_1x1(self):
        m = NeuralRenderer(feat_nc=64, n_blocks=0)
        x = jax.random.normal(KEY, (1, 32, 32, 64))
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == (1, 32, 32, 3)
        # n_blocks=0 -> exactly one conv kernel in params
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert len(flat) == 2  # kernel + bias

    def test_progressive_upsample(self):
        m = NeuralRenderer(feat_nc=64, n_blocks=2)
        x = jax.random.normal(KEY, (1, 8, 8, 64))
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == (1, 32, 32, 3)

    def test_get_renderer_modes(self):
        x = jax.random.normal(KEY, (1, 8, 8, 64))
        for mode in ["1-1", "1-4-1"]:
            m = get_renderer(64, mode)
            params = m.init(KEY, x)
            out = m.apply(params, x)
            assert out.shape == (1, 8, 8, 3)
            assert 0 <= float(out.min()) and float(out.max()) <= 1


class TestCGNet:
    def test_mask_shape_and_range(self):
        m = ContextGuidedNetwork(classes=1, M=2, N=2, input_channel=3)
        x = jax.random.normal(KEY, (1, 64, 96, 3))
        variables = m.init(KEY, x, train=False)
        out = m.apply(variables, x, train=False)
        assert out.shape == (1, 64, 96, 1)
        assert 0 <= float(out.min()) and float(out.max()) <= 1

    def test_train_mode_updates_batch_stats(self):
        m = ContextGuidedNetwork()
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        variables = m.init(KEY, x, train=True)
        out, mutated = m.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in mutated

    def test_group_norm_variant(self):
        m = ContextGuidedNetwork(norm="group")
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        variables = m.init(KEY, x, train=True)
        out = m.apply(variables, x, train=True)
        assert out.shape == (1, 32, 32, 1)


class TestLegacyAndExtras:
    def test_eattr(self):
        m = EAttr(output_nc=8)
        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        params = m.init(KEY, x)
        assert m.apply(params, x).shape == (1, 8)

    def test_implicit_mask(self):
        m = ImplicitMask()
        x = jax.random.normal(KEY, (16, 128 + 42))
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == (16, 1)
        assert 0 <= float(out.min()) and float(out.max()) <= 1

    def test_rrdb(self):
        m = RRDBNet(channels=64, filters=64, num_res_blocks=2)
        x = jax.random.normal(KEY, (1, 16, 16, 64))
        params = m.init(KEY, x)
        out = m.apply(params, x)
        assert out.shape == (1, 16, 16, 3)
        assert 0 <= float(out.min()) and float(out.max()) <= 1
