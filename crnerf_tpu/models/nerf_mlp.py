"""NeRF MLPs.

``NerfMLP`` is the hot-loop model (reference ``NeRF_sigma``,
/root/reference/models/nerf.py:115-182): an 8x256 ReLU MLP over the
positional-encoded xyz with a skip connection feeding the raw encoding back
in before layer 4, a Softplus sigma head, and a direction branch
Linear(256+27 -> 128)+ReLU then Linear(128 -> nerf_out_dim)+Sigmoid that emits
the 64-dim *cross-ray feature* (not RGB). Forward returns
``cat([feature, sigma])`` -> (B, nerf_out_dim+1).

HBM note: every concat-then-matmul layer (the skip, the dir branch) is
computed as two matmuls over slices of ONE kernel —
``cat([a, b]) @ K == a @ K[:da] + b @ K[da:]`` — so the wide concatenated
activation (e.g. (N, 349) at the skip) never materializes in HBM. Param
shapes stay identical to the reference layout (``SplitDense`` stores the
same (da+db, out) kernel an ``nn.Dense`` over the concat would).

``NerfWMLP`` mirrors the legacy NeRF-W-style variant with the appearance
embedding concatenated into the direction branch and a detached
random-appearance second head (models/nerf.py:33-113, unused by the shipped
training path but part of the model zoo).

``NerfTanhMLP`` mirrors ``NeRF_sigma_tanh`` (models/nerf.py:184-264):
LeakyReLU(0.2) trunk and Tanh feature head.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SplitDense(nn.Module):
    """Dense over an implicit concat of two inputs, without the concat.

    Parameters are laid out exactly like ``nn.Dense(features)`` applied to
    ``cat([a, b], -1)``: kernel (da + db, features), bias (features,).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        da, db = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (da + db, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        dt = self.dtype
        out = (
            a.astype(dt) @ kernel[:da].astype(dt)
            + b.astype(dt) @ kernel[da:].astype(dt)
        )
        return out + bias.astype(dt)


class NerfMLP(nn.Module):
    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    in_channels_xyz: int = 93
    in_channels_dir: int = 27
    out_dim: int = 64  # nerf_out_dim
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb, dir_emb, sigma_only: bool = False):
        """xyz_emb: (..., 93), dir_emb: (..., 27) ->
        (..., out_dim+1) = [sigmoid features, softplus sigma].

        Sigma is always computed in fp32 regardless of compute_dtype (the
        exp(-delta*sigma) compositing is precision-sensitive).
        """
        dt = self.compute_dtype
        x = xyz_emb.astype(dt)
        h = x
        for i in range(self.depth):
            if i in self.skips:
                h = SplitDense(
                    self.width, name=f"xyz_encoding_{i + 1}", dtype=dt
                )(x, h)
            else:
                h = nn.Dense(
                    self.width, name=f"xyz_encoding_{i + 1}", dtype=dt
                )(h)
            h = nn.relu(h)

        sigma = nn.Dense(1, name="sigma", dtype=jnp.float32)(
            h.astype(jnp.float32)
        )
        sigma = jax.nn.softplus(sigma)
        if sigma_only:
            return sigma

        h_final = nn.Dense(self.width, name="xyz_encoding_final", dtype=dt)(h)
        d = SplitDense(self.width // 2, name="dir_encoding", dtype=dt)(
            h_final, dir_emb
        )
        d = nn.relu(d)
        feat = nn.Dense(self.out_dim, name="feature", dtype=dt)(d)
        feat = nn.sigmoid(feat)
        return jnp.concatenate(
            [feat.astype(jnp.float32), sigma], -1
        )


class NerfWMLP(nn.Module):
    """Legacy NeRF-W variant: appearance embedding in the dir branch and an
    optional detached random-appearance head (models/nerf.py:74-113)."""

    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    in_channels_xyz: int = 93
    in_channels_dir: int = 27
    in_channels_a: int = 48
    out_dim: int = 3
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb, dir_emb, a_emb, a_emb_random=None):
        dt = self.compute_dtype
        x = xyz_emb.astype(dt)
        h = x
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([x, h], -1)
            h = nn.Dense(self.width, name=f"xyz_encoding_{i + 1}", dtype=dt)(h)
            h = nn.relu(h)
        h_final = nn.Dense(self.width, name="xyz_encoding_final", dtype=dt)(h)

        dir_branch = nn.Sequential(
            [
                nn.Dense(self.width // 2, name="dir_encoding", dtype=dt),
                nn.relu,
                nn.Dense(self.out_dim, name="rgb", dtype=dt),
                nn.sigmoid,
            ]
        )
        d_in = jnp.concatenate([h_final, dir_emb.astype(dt), a_emb.astype(dt)], -1)
        static = dir_branch(d_in)
        if a_emb_random is None:
            return static
        d_in_r = jnp.concatenate(
            [
                jax.lax.stop_gradient(h_final),
                jax.lax.stop_gradient(dir_emb.astype(dt)),
                jax.lax.stop_gradient(a_emb_random.astype(dt)),
            ],
            -1,
        )
        static_r = dir_branch(d_in_r)
        return jnp.concatenate([static, static_r], -1)


class NerfTanhMLP(nn.Module):
    """``NeRF_sigma_tanh`` (models/nerf.py:184-264): LeakyReLU(0.2) trunk,
    Tanh feature head, same sigma head."""

    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    out_dim: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb, dir_emb, sigma_only: bool = False):
        dt = self.compute_dtype
        x = xyz_emb.astype(dt)
        h = x
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([x, h], -1)
            h = nn.Dense(self.width, name=f"xyz_encoding_{i + 1}", dtype=dt)(h)
            h = jax.nn.leaky_relu(h, 0.2)

        sigma = nn.Dense(1, name="sigma", dtype=jnp.float32)(
            h.astype(jnp.float32)
        )
        sigma = jax.nn.softplus(sigma)
        if sigma_only:
            return sigma

        h_final = nn.Dense(self.width, name="xyz_encoding_final", dtype=dt)(h)
        d = jnp.concatenate([h_final, dir_emb.astype(dt)], -1)
        d = nn.Dense(self.width // 2, name="dir_encoding", dtype=dt)(d)
        d = jax.nn.leaky_relu(d, 0.2)
        feat = nn.Dense(self.out_dim, name="feature", dtype=dt)(d)
        feat = jnp.tanh(feat)
        return jnp.concatenate([feat.astype(jnp.float32), sigma], -1)
