"""Pallas kernel tests — every kernel must match its pure-jnp reference
(run in interpreter mode on the CPU mesh; the same code compiles via Mosaic
on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crnerf_tpu.core.encoding import posenc
from crnerf_tpu.models.nerf_mlp import NerfMLP
from crnerf_tpu.ops.fused_mlp import (
    fused_mlp_apply,
    mlp_params_from_flax,
    reference_mlp_apply,
)


def _setup_mlp(out_dim=64, depth=8, width=256, seed=0):
    mlp = NerfMLP(depth=depth, width=width, out_dim=out_dim)
    xyz = jax.random.normal(jax.random.PRNGKey(seed + 1), (300, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(seed + 2), (300, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    v = mlp.init(jax.random.PRNGKey(seed), posenc(xyz, 15), posenc(dirs, 4))
    return mlp, v, xyz, dirs


class TestFusedMlp:
    def test_reference_matches_flax(self):
        mlp, v, xyz, dirs = _setup_mlp()
        p = mlp_params_from_flax(v["params"])
        ref = reference_mlp_apply(p, xyz, dirs, 15, 4)
        fl = mlp.apply(v, posenc(xyz, 15), posenc(dirs, 4))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fl),
                                   atol=1e-6)

    def test_kernel_matches_reference(self):
        mlp, v, xyz, dirs = _setup_mlp()
        p = mlp_params_from_flax(v["params"])
        ref = reference_mlp_apply(p, xyz, dirs, 15, 4)
        ker = fused_mlp_apply(p, xyz, dirs, tile=256, interpret=True)
        assert ker.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   atol=2e-6)

    def test_kernel_nondivisible_n(self):
        """N not a multiple of tile exercises padding."""
        mlp, v, xyz, dirs = _setup_mlp()
        p = mlp_params_from_flax(v["params"])
        ref = reference_mlp_apply(p, xyz[:77], dirs[:77], 15, 4)
        ker = fused_mlp_apply(p, xyz[:77], dirs[:77], tile=128,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   atol=2e-6)

    def test_kernel_small_width_model(self):
        """Width 64 (below one lane tile) still pads correctly."""
        mlp, v, xyz, dirs = _setup_mlp(out_dim=16, depth=4, width=64,
                                       seed=7)
        p = mlp_params_from_flax(v["params"], depth=4)
        ref = reference_mlp_apply(p, xyz, dirs, 15, 4)
        ker = fused_mlp_apply(p, xyz, dirs, tile=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   atol=2e-6)

    def test_sigma_nonnegative_features_bounded(self):
        mlp, v, xyz, dirs = _setup_mlp()
        p = mlp_params_from_flax(v["params"])
        out = fused_mlp_apply(p, xyz, dirs, tile=256, interpret=True)
        feat, sigma = out[:, :-1], out[:, -1]
        assert float(sigma.min()) >= 0
        assert float(feat.min()) >= 0 and float(feat.max()) <= 1

    def test_bf16_compute_close(self):
        mlp, v, xyz, dirs = _setup_mlp()
        p = mlp_params_from_flax(v["params"])
        ref = reference_mlp_apply(p, xyz, dirs, 15, 4)
        ker = fused_mlp_apply(p, xyz, dirs, tile=256, interpret=True,
                              compute_dtype=jnp.bfloat16)
        # bf16 matmuls with fp32 accumulation: loose but bounded
        assert float(jnp.abs(ker - ref).max()) < 0.05


class TestGroupedEncode:
    def test_fast_sincos_close_to_exact(self):
        """Double-angle recurrence vs exact XLA sin/cos: error bounded by
        ~2^F * fp32-ulp, well under bf16 quantization (4e-3)."""
        from crnerf_tpu.ops.fused_mlp import _grouped_sincos

        v = jax.random.uniform(jax.random.PRNGKey(0), (500, 3),
                               minval=-5.0, maxval=5.0)
        s_e, c_e = _grouped_sincos(v, 15, exact=True)
        s_f, c_f = _grouped_sincos(v, 15, exact=False)
        assert float(jnp.abs(s_f - s_e).max()) < 5e-4
        assert float(jnp.abs(c_f - c_e).max()) < 5e-4
        # anchor octaves are exact
        assert float(jnp.abs(s_f[:, :3] - s_e[:, :3]).max()) == 0.0
        assert float(jnp.abs(s_f[:, 24:27] - s_e[:, 24:27]).max()) == 0.0

    def test_dir_rep_equivalence(self):
        """Per-ray dirs with dir_rep == pre-broadcast per-point dirs."""
        from crnerf_tpu.ops.fused_mlp import grouped_encode

        n, s = 20, 6
        xyz = jax.random.normal(jax.random.PRNGKey(1), (n * s, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        dirs_pt = jnp.broadcast_to(
            dirs[:, None, :], (n, s, 3)
        ).reshape(n * s, 3)
        a = grouped_encode(xyz, dirs_pt, 15, 4)
        b = grouped_encode(xyz, dirs, 15, 4, dir_rep=s)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    def test_packed_apply_matches_sliced(self):
        mlp, v, xyz, dirs = _setup_mlp(out_dim=16, depth=4, width=64)
        p = mlp_params_from_flax(v["params"], depth=4)
        ref = fused_mlp_apply(p, xyz, dirs, tile=128, interpret=True)
        raw = fused_mlp_apply(p, xyz, dirs, tile=128, interpret=True,
                              packed=True)
        assert raw.shape[-1] % 128 == 0
        np.testing.assert_allclose(np.asarray(raw[:, :17]), np.asarray(ref),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(raw[:, 17:]), 0.0)


class TestCompositePacked:
    def test_matches_split_composite(self):
        from crnerf_tpu.core.compositing import composite, composite_packed

        n, s, c = 50, 12, 16
        feats = jax.random.uniform(jax.random.PRNGKey(0), (n, s, c))
        sigmas = jax.random.uniform(jax.random.PRNGKey(1), (n, s)) * 3
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(2), (n, s)) * 5 + 0.5,
            -1,
        )
        block = jnp.concatenate(
            [feats, sigmas[..., None],
             jnp.zeros((n, s, 128 - c - 1))], -1
        )
        w_r, f_r, d_r = composite(feats, sigmas, z)
        w_p, f_p, d_p = composite_packed(block, c, z)
        np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_r),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_r),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r),
                                   atol=1e-6)

    def test_packed_gradients_match(self):
        """Grad w.r.t. the packed block == grad via the split composite
        (junk lanes get zero cotangent from the sliced outputs)."""
        from crnerf_tpu.core.compositing import composite, composite_packed

        n, s, c = 8, 6, 4
        block = jax.random.uniform(jax.random.PRNGKey(3), (n, s, 128))
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(4), (n, s)) * 4 + 0.5, -1
        )

        def loss_packed(b):
            w, f, d = composite_packed(b, c, z)
            return jnp.sum(f ** 2) + jnp.sum(d) + jnp.sum(w[:, 0])

        def loss_split(b):
            w, f, d = composite(b[..., :c], b[..., c], z)
            return jnp.sum(f ** 2) + jnp.sum(d) + jnp.sum(w[:, 0])

        g_p = jax.grad(loss_packed)(block)
        g_s = jax.grad(loss_split)(block)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s),
                                   atol=1e-5)


class TestCompositeKernel:
    def _data(self, n=300, s=20, c=48):
        import jax

        feats = jax.random.uniform(jax.random.PRNGKey(0), (n, s, c))
        sigmas = jax.random.uniform(jax.random.PRNGKey(1), (n, s)) * 3
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(2), (n, s)) * 5 + 0.5,
            axis=-1,
        )
        return feats, sigmas, z

    def test_matches_jnp_reference(self):
        from crnerf_tpu.core.compositing import composite
        from crnerf_tpu.ops.composite import composite_pallas

        feats, sigmas, z = self._data()
        w_ref, f_ref, d_ref = composite(feats, sigmas, z)
        w_k, f_k, d_k = composite_pallas(
            feats, sigmas, z, ray_tile=128, interpret=True
        )
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_ref),
                                   atol=1e-5)

    def test_weights_bounded(self):
        from crnerf_tpu.ops.composite import composite_pallas

        feats, sigmas, z = self._data(n=64, s=16, c=8)
        w, f, d = composite_pallas(feats, sigmas, z, ray_tile=64,
                                   interpret=True)
        ws = np.asarray(w).sum(-1)
        assert (ws <= 1 + 1e-5).all() and (ws >= 0).all()


class TestFusedRendererPath:
    def test_render_rays_fused_matches_flax(self):
        """render_rays with the fused kernel (interpret) == flax path at
        test time."""
        import jax

        from crnerf_tpu.render.renderer import render_rays

        mlp, v, _, _ = _setup_mlp(out_dim=16, depth=4, width=64)
        params = {"coarse": v["params"], "fine": v["params"]}
        apply_fn = lambda p, x, d: mlp.apply({"params": p}, x, d)  # noqa

        n = 40
        o = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
        d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.concatenate(
            [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 4.0)], -1
        )
        kw = dict(n_samples=8, n_importance=8, test_time=True,
                  perturb=0.0, noise_std=0.0)
        ref = render_rays(apply_fn, apply_fn, params, rays,
                          jax.random.PRNGKey(0), **kw)
        fused = render_rays(
            apply_fn, apply_fn, params, rays, jax.random.PRNGKey(0),
            fused_opts={"n_emb_dir": 4, "depth": 4, "tile": 128,
                        "interpret": True},
            **kw,
        )
        np.testing.assert_allclose(
            np.asarray(fused["feature_fine"]),
            np.asarray(ref["feature_fine"]), atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(fused["depth_fine"]),
            np.asarray(ref["depth_fine"]), atol=5e-4,
        )


class TestFullFusedRendererPath:
    def test_render_rays_full_fused_matches_flax(self):
        """render_rays with MLP+composite fused in one kernel (interpret)
        == flax path at test time."""
        from crnerf_tpu.render.renderer import render_rays

        mlp, v, _, _ = _setup_mlp(out_dim=16, depth=4, width=64)
        params = {"coarse": v["params"], "fine": v["params"]}
        apply_fn = lambda p, x, d: mlp.apply({"params": p}, x, d)  # noqa

        n = 40
        o = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
        d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.concatenate(
            [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 4.0)], -1
        )
        kw = dict(n_samples=8, n_importance=8, test_time=True,
                  perturb=0.0, noise_std=0.0)
        ref = render_rays(apply_fn, apply_fn, params, rays,
                          jax.random.PRNGKey(0), **kw)
        fused = render_rays(
            apply_fn, apply_fn, params, rays, jax.random.PRNGKey(0),
            fused_opts={"n_emb_dir": 4, "depth": 4, "interpret": True,
                        "full": True},
            **kw,
        )
        # small residuals from enc-contraction accumulation order can
        # flip sample_pdf's discrete bins on boundary rays
        np.testing.assert_allclose(
            np.asarray(fused["feature_fine"]),
            np.asarray(ref["feature_fine"]), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(fused["weights_coarse"]),
            np.asarray(ref["weights_coarse"]), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(fused["depth_fine"]),
            np.asarray(ref["depth_fine"]), atol=5e-3,
        )


class TestFusedMlpTrainVjp:
    def test_weight_grads_match_reference(self):
        """Custom-VJP Pallas backward == jax.grad of the jnp reference."""
        import jax

        from crnerf_tpu.ops.fused_mlp import make_fused_mlp_train

        mlp, v, xyz, dirs = _setup_mlp(out_dim=16, depth=4, width=64,
                                       seed=11)
        p = mlp_params_from_flax(v["params"], depth=4)
        g = jax.random.normal(jax.random.PRNGKey(5), (300, 17)) * 0.1

        def loss_ref(p):
            return jnp.sum(reference_mlp_apply(p, xyz, dirs, 15, 4) * g)

        g_ref = jax.grad(loss_ref)(p)
        apply_train = make_fused_mlp_train(15, 4, tile=128, interpret=True)

        def loss_ker(p):
            return jnp.sum(apply_train(p, xyz, dirs) * g)

        g_ker = jax.grad(loss_ker)(p)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-5)

    def test_packed_dir_rep_grads_match_reference(self):
        """The production train route (packed cotangents, per-ray dirs)
        produces the same weight grads as jax.grad of the jnp twin."""
        import jax

        from crnerf_tpu.ops.fused_mlp import make_fused_mlp_train

        mlp, v, xyz, dirs = _setup_mlp(out_dim=16, depth=4, width=64,
                                       seed=13)
        p = mlp_params_from_flax(v["params"], depth=4)
        s = 5
        dirs_ray = dirs[:60]                     # (60, 3) per-ray
        xyz_pt = xyz[: 60 * s]                   # (300, 3) points
        dirs_pt = jnp.broadcast_to(
            dirs_ray[:, None, :], (60, s, 3)
        ).reshape(60 * s, 3)
        g = jax.random.normal(jax.random.PRNGKey(5), (300, 17)) * 0.1

        def loss_ref(p):
            return jnp.sum(
                reference_mlp_apply(p, xyz_pt, dirs_pt, 15, 4) * g
            )

        g_ref = jax.grad(loss_ref)(p)
        apply_train = make_fused_mlp_train(
            15, 4, tile=128, interpret=True, dir_rep=s, packed=True
        )
        g_pad = jnp.zeros((300, 128)).at[:, :17].set(g)

        def loss_ker(p):
            return jnp.sum(apply_train(p, xyz_pt, dirs_ray) * g_pad)

        g_ker = jax.grad(loss_ker)(p)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-5)

    def test_no_input_grads(self):
        import jax

        from crnerf_tpu.ops.fused_mlp import make_fused_mlp_train

        mlp, v, xyz, dirs = _setup_mlp(out_dim=16, depth=4, width=64)
        p = mlp_params_from_flax(v["params"], depth=4)
        apply_train = make_fused_mlp_train(15, 4, tile=128, interpret=True)
        gx = jax.grad(
            lambda x: jnp.sum(apply_train(p, x, dirs))
        )(xyz)
        np.testing.assert_array_equal(np.asarray(gx), 0.0)


class TestFusedRender:
    """MLP+compositing fused kernel vs the jnp twin (interpret mode)."""

    def _setup(self, n=24, s=16, out_dim=16, depth=4, width=64, seed=3):
        mlp = NerfMLP(depth=depth, width=width, out_dim=out_dim)
        xyz = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, s, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(seed + 2), (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        v = mlp.init(jax.random.PRNGKey(seed),
                     posenc(xyz[:, 0], 15), posenc(dirs, 4))
        p = mlp_params_from_flax(v["params"], depth=depth)
        z = jnp.sort(
            jax.random.uniform(jax.random.PRNGKey(seed + 3), (n, s)) * 4
            + 0.5, -1,
        )
        noise = jax.random.normal(jax.random.PRNGKey(seed + 4), (n, s))
        return p, xyz, dirs, z, noise

    def test_forward_matches_twin(self):
        from crnerf_tpu.ops.fused_render import (
            fused_render_apply, reference_render_apply,
        )

        p, xyz, dirs, z, noise = self._setup()
        fmap_r, w_r, d_r = reference_render_apply(p, xyz, dirs, z, noise,
                                                  15, 4)
        ray_blk, w_k = fused_render_apply(
            p, xyz, dirs, z, noise, r_tile=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(ray_blk[:, :16]),
                                   np.asarray(fmap_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ray_blk[:, 16]),
                                   np.asarray(d_r), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ray_blk[:, 17:]), 0.0)

    def test_forward_ray_padding(self):
        from crnerf_tpu.ops.fused_render import (
            fused_render_apply, reference_render_apply,
        )

        p, xyz, dirs, z, noise = self._setup(n=21)  # 21 % 8 != 0
        fmap_r, w_r, d_r = reference_render_apply(p, xyz, dirs, z, noise,
                                                  15, 4)
        ray_blk, w_k = fused_render_apply(
            p, xyz, dirs, z, noise, r_tile=8, interpret=True
        )
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(ray_blk[:, :16]),
                                   np.asarray(fmap_r), atol=2e-5)

    def test_weight_grads_match_twin(self):
        from crnerf_tpu.ops.fused_render import (
            make_fused_render_train, reference_render_apply,
        )

        p, xyz, dirs, z, noise = self._setup(n=16, s=16)
        g_f = jax.random.normal(jax.random.PRNGKey(9), (16, 17)) * 0.1
        g_w = jax.random.normal(jax.random.PRNGKey(10), (16, 16)) * 0.1

        def loss_ref(p):
            fmap, w, d = reference_render_apply(p, xyz, dirs, z, noise,
                                                15, 4)
            return (jnp.sum(fmap * g_f[:, :16]) + jnp.sum(w * g_w)
                    + jnp.sum(d * g_f[:, 16]))

        g_ref = jax.grad(loss_ref)(p)

        apply_train = make_fused_render_train(15, 4, s=16, r_tile=8,
                                              interpret=True)
        g_blk = jnp.zeros((16, 128)).at[:, :16].set(g_f[:, :16])
        g_blk = g_blk.at[:, 16].set(g_f[:, 16])

        def loss_ker(p):
            blk, w = apply_train(p, xyz, dirs, z, noise)
            return jnp.sum(blk * g_blk) + jnp.sum(w * g_w)

        g_ker = jax.grad(loss_ker)(p)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-3)

    def test_no_input_grads(self):
        from crnerf_tpu.ops.fused_render import make_fused_render_train

        p, xyz, dirs, z, noise = self._setup(n=8, s=16)
        apply_train = make_fused_render_train(15, 4, s=16, r_tile=8,
                                              interpret=True)
        gz = jax.grad(
            lambda zz: jnp.sum(apply_train(p, xyz, dirs, zz, noise)[0])
        )(z)
        np.testing.assert_array_equal(np.asarray(gz), 0.0)


class TestRaysInFusedRender:
    """v6: xyz + positional encode computed INSIDE the kernel from
    per-ray origins/dirs/z — must match the explicit-xyz path/twin."""

    def _setup(self, n=24, s=16, seed=3):
        """Inputs quantized to 6 fractional bits so o + d*z is exactly
        representable: the kernel's separate mul+add and XLA's fused
        multiply-add then agree BITWISE, letting the twin comparisons
        stay tight. (With full-mantissa inputs the two differ by ~1 ulp,
        which sin(2^14 x) amplifies to ~8e-3 in the top octaves —
        real-world-identical to cross-hardware drift and below the
        production bf16 rounding.)"""
        q = lambda x: jnp.round(x * 64.0) / 64.0  # noqa: E731
        mlp = NerfMLP(depth=4, width=64, out_dim=16)
        o = q(jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3)))
        d = jax.random.normal(jax.random.PRNGKey(seed + 2), (n, 3))
        d = q(d / jnp.linalg.norm(d, axis=-1, keepdims=True))
        z = jnp.sort(
            q(jax.random.uniform(jax.random.PRNGKey(seed + 3), (n, s)) * 4
              + 0.5), -1,
        )
        xyz = o[:, None, :] + d[:, None, :] * z[..., None]
        v = mlp.init(jax.random.PRNGKey(seed),
                     posenc(xyz[:, 0], 15), posenc(d, 4))
        p = mlp_params_from_flax(v["params"], depth=4)
        noise = jax.random.normal(jax.random.PRNGKey(seed + 4), (n, s))
        return p, o, d, z, xyz, noise

    def test_forward_matches_twin(self):
        from crnerf_tpu.ops.fused_render import (
            fused_render_apply, reference_render_apply,
        )

        p, o, d, z, xyz, noise = self._setup()
        fmap_r, w_r, d_r = reference_render_apply(p, xyz, d, z, noise,
                                                  15, 4)
        blk, w_k = fused_render_apply(
            p, o, d, z, noise, r_tile=8, interpret=True, rays_in=True
        )
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(blk[:, :16]),
                                   np.asarray(fmap_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(blk[:, 16]),
                                   np.asarray(d_r), atol=2e-4)

    def test_matches_stream_mode(self):
        """rays_in == explicit-xyz kernel to near-bitwise (the in-kernel
        2^k*x matmul is exact: power-of-2 multipliers)."""
        from crnerf_tpu.ops.fused_render import fused_render_apply

        p, o, d, z, xyz, noise = self._setup(n=16)
        blk_a, w_a = fused_render_apply(
            p, xyz, d, z, noise, r_tile=8, interpret=True
        )
        blk_b, w_b = fused_render_apply(
            p, o, d, z, noise, r_tile=8, interpret=True, rays_in=True
        )
        # the in-kernel encode is exact (power-of-2 scale matmul +
        # bitwise sin); residual diffs come only from different f32
        # accumulation orders in the enc contraction
        np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_a),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(blk_b), np.asarray(blk_a),
                                   atol=2e-4)

    def test_weight_grads_match_twin(self):
        from crnerf_tpu.ops.fused_render import (
            make_fused_render_train, reference_render_apply,
        )

        p, o, d, z, xyz, noise = self._setup(n=16)
        g_f = jax.random.normal(jax.random.PRNGKey(9), (16, 17)) * 0.1
        g_w = jax.random.normal(jax.random.PRNGKey(10), (16, 16)) * 0.1

        def loss_ref(p):
            fmap, w, dep = reference_render_apply(p, xyz, d, z, noise,
                                                  15, 4)
            return (jnp.sum(fmap * g_f[:, :16]) + jnp.sum(w * g_w)
                    + jnp.sum(dep * g_f[:, 16]))

        g_ref = jax.grad(loss_ref)(p)
        apply_train = make_fused_render_train(
            15, 4, s=16, r_tile=8, interpret=True, rays_in=True
        )
        g_blk = jnp.zeros((16, 128)).at[:, :16].set(g_f[:, :16])
        g_blk = g_blk.at[:, 16].set(g_f[:, 16])

        def loss_ker(p):
            blk, w = apply_train(p, o, d, z, noise)
            return jnp.sum(blk * g_blk) + jnp.sum(w * g_w)

        g_ker = jax.grad(loss_ker)(p)
        for a_, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                       atol=1e-4, rtol=1e-3)
    def test_stash_backward_bit_matches_recompute(self):
        """The stash backward (fwd writes trunk acts + encode, bwd skips
        the forward recompute) must produce BIT-IDENTICAL grads to the
        recompute backward: the stash holds exactly the compute_dtype
        values the forward's matmuls consumed."""
        from crnerf_tpu.ops.fused_render import make_fused_render_train

        p, o, d, z, xyz, noise = self._setup(n=16)
        kw = dict(s=16, r_tile=8, interpret=True, rays_in=True)
        f_rec = make_fused_render_train(15, 4, **kw, stash=False)
        f_sta = make_fused_render_train(15, 4, **kw, stash=True)

        def loss(fn, pp):
            blk, w = fn(pp, o, d, z, noise)
            return jnp.sum(blk[:, :17] ** 2) + jnp.sum(w * jnp.cos(w))

        v1, g1 = jax.value_and_grad(lambda q: loss(f_rec, q))(p)
        v2, g2 = jax.value_and_grad(lambda q: loss(f_sta, q))(p)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        for a_, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))

    def test_stash_requires_rays_in(self):
        from crnerf_tpu.ops.fused_render import make_fused_render_train

        with pytest.raises(ValueError, match="rays-in"):
            make_fused_render_train(15, 4, s=16, stash=True, rays_in=False)

    def test_split_fwd_bwd_tiles_match(self):
        """r_tile_bwd != r_tile re-blocks the flat HBM stash for the
        backward; values identical, grads equal up to tile-reduction fp
        order. Covers the production default (fwd 4096-pt, bwd 2048-pt
        tiles) incl. the non-divisible-ray-count padding path."""
        from crnerf_tpu.ops.fused_render import make_fused_render_train

        p, o, d, z, xyz, noise = self._setup(n=24)
        kw = dict(s=16, interpret=True, rays_in=True, stash=True)

        def loss(fn, pp):
            blk, w = fn(pp, o, d, z, noise)
            return jnp.sum(blk[:, :17] ** 2) + jnp.sum(w * jnp.cos(w))

        f_ref = make_fused_render_train(15, 4, **kw, r_tile=8)
        v1, g1 = jax.value_and_grad(lambda q: loss(f_ref, q))(p)
        for rf, rb in ((16, 8), (8, 16)):
            fn = make_fused_render_train(15, 4, **kw, r_tile=rf,
                                         r_tile_bwd=rb)
            v2, g2 = jax.value_and_grad(lambda q: loss(fn, q))(p)
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                       rtol=1e-6)
            for a_, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
                np.testing.assert_allclose(np.asarray(a_),
                                           np.asarray(b_),
                                           atol=1e-5, rtol=1e-4)

    def test_split_tiles_must_divide(self):
        from crnerf_tpu.ops.fused_render import make_fused_render_train

        with pytest.raises(ValueError, match="divide"):
            make_fused_render_train(
                15, 4, s=16, rays_in=True, r_tile=24, r_tile_bwd=16
            )

    def test_auto_tiles_valid_for_any_sample_count(self):
        """Auto tile selection must stay sublane-aligned and mutually
        divisible for NON-power-of-two sample counts (4096//192 = 21 —
        neither; e.g. N_samples=64 + N_importance=128 gives fine s=192).
        Regression: the factory used to raise its own divisibility error
        at trace time for such configs."""
        from crnerf_tpu.ops.fused_render import make_fused_render_train

        for s in (24, 96, 160, 192, 320):
            fn = make_fused_render_train(
                15, 4, s=s, rays_in=True, stash=True, interpret=True
            )
            assert fn is not None

    def test_fast_encode_close_to_exact(self):
        """In-kernel anchored recurrence (exact_encode=False) vs exact —
        same error envelope as the stream fast_sincos ladder."""
        from crnerf_tpu.ops.fused_render import fused_render_apply

        p, o, d, z, xyz, noise = self._setup(n=16)
        blk_e, w_e = fused_render_apply(
            p, o, d, z, noise, r_tile=8, interpret=True, rays_in=True,
            exact_encode=True,
        )
        blk_f, w_f = fused_render_apply(
            p, o, d, z, noise, r_tile=8, interpret=True, rays_in=True,
            exact_encode=False,
        )
        assert float(jnp.abs(blk_f - blk_e).max()) < 5e-3
        assert float(jnp.abs(w_f - w_e).max()) < 5e-3

    def test_pertube_cord_falls_back_to_stream_mode(self):
        """--pertubeCord jitters explicit xyz, which the rays-in kernel
        cannot represent — the renderer must fall back to the
        encode-stream kernel and still run end to end."""
        from crnerf_tpu.render.renderer import render_rays

        mlp = NerfMLP(depth=4, width=64, out_dim=16)
        n = 16
        o = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
        d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.concatenate(
            [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 4.0)], -1
        )
        v = mlp.init(jax.random.PRNGKey(0), posenc(o, 15), posenc(d, 4))
        params = {"coarse": v["params"], "fine": v["params"]}
        apply_fn = lambda p, x, dd: mlp.apply({"params": p}, x, dd)  # noqa

        kw = dict(n_samples=8, n_importance=8, test_time=False,
                  perturb=1.0, noise_std=0.0, pertube_cord=True)
        out = render_rays(
            apply_fn, apply_fn, params, rays, jax.random.PRNGKey(0),
            fused_opts={"n_emb_dir": 4, "depth": 4, "interpret": True,
                        "full": True},
            **kw,
        )
        assert out["feature_fine"].shape == (n, 16)
        assert bool(jnp.isfinite(out["feature_fine"]).all())
