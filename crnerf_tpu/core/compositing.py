"""Alpha compositing of per-sample features along rays.

Reference semantics (/root/reference/models/rendering.py:118-143):
- deltas from consecutive z values, final delta = 1e2 (NOT 1e10 —
  rendering.py:122)
- train-time sigma regularization: alpha = 1 - exp(-delta * relu(sigma+noise))
  with noise ~ N(0, noise_std^2) (rendering.py:125-126)
- transmittance = shifted exclusive cumprod of (1 - alpha)
  (rendering.py:128-132)
- weights = alpha * transmittance; outputs are the weighted feature sum
  (64-dim "cross-ray" features, not RGB) and expected depth
  (rendering.py:136-143).

Pure jnp; the Pallas kernel in ``crnerf_tpu.ops.composite`` must match this
in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

DELTA_INF = 1e2


def compute_alphas(sigmas, z_vals, noise_std: float = 0.0,
                   key: Optional[jax.Array] = None):
    """sigmas, z_vals: (N_rays, S) -> alphas (N_rays, S)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], DELTA_INF)], -1
    )
    if noise_std > 0.0:
        if key is None:
            raise ValueError("noise_std > 0 requires a PRNG key")
        noise = jax.random.normal(key, sigmas.shape, sigmas.dtype) * noise_std
    else:
        noise = jnp.zeros_like(sigmas)
    return 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas + noise))


def weights_from_alphas(alphas):
    """Exclusive-cumprod transmittance * alpha (rendering.py:128-132)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1]], -1
    )
    transmittance = jnp.cumprod(shifted, -1)
    return alphas * transmittance


def composite(features, sigmas, z_vals, noise_std: float = 0.0,
              key: Optional[jax.Array] = None):
    """Full compositing pass.

    features: (N_rays, S, C) per-sample features (C = nerf_out_dim, 64);
    sigmas: (N_rays, S); z_vals: (N_rays, S).
    Returns (weights (N,S), feature_map (N,C), depth (N,)).
    """
    alphas = compute_alphas(sigmas, z_vals, noise_std, key)
    weights = weights_from_alphas(alphas)
    feature_map = jnp.einsum(
        "ns,nsc->nc", weights, features,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)
    depth = jnp.sum(weights * z_vals, -1)
    return weights, feature_map, depth
