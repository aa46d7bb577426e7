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
