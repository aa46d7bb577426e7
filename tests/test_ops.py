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
