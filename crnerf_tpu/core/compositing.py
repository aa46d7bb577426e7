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


def composite_packed(out_block, c_out: int, z_vals,
                     noise_std: float = 0.0,
                     key: Optional[jax.Array] = None):
    """Compositing over the RAW fused-kernel lane block (N, S, c_pad):
    sigmoid features in cols [:c_out], softplus sigma in col c_out, zeros
    beyond. Skipping the features/sigma minor-dim slices avoids ~800 MB of
    relayout copies per pass at CR-NeRF train shapes (the slices' transpose
    was a pad + dynamic-update-slice chain of the same size in backward).

    Returns (weights (N,S), feature_map (N,c_out), depth (N,)) — identical
    values to ``composite(out_block[...,:c_out], out_block[...,c_out], ...)``.
    """
    sigmas = out_block[..., c_out]
    alphas = compute_alphas(sigmas, z_vals, noise_std, key)
    weights = weights_from_alphas(alphas)
    # one einsum over ALL lanes (junk cols produce junk sums, sliced off a
    # tiny (N, c_pad) result instead of the big operand)
    fmap = jnp.einsum(
        "ns,nsc->nc", weights, out_block,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    depth = jnp.sum(weights * z_vals, -1)
    return weights, fmap[:, :c_out], depth


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
