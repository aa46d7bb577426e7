"""Positional (frequency) encoding.

Reference: ``PosEmbedding`` (/root/reference/models/nerf.py:4-30):
x -> [x, sin(f_0 x), cos(f_0 x), ..., sin(f_{N-1} x), cos(f_{N-1} x)]
with logscale frequencies f_k = 2^linspace(0, max_logscale, N). The reference
interleaves (sin_k, cos_k) pairs per frequency; we keep that exact channel
order so feature-level parity checks line up.

CR-NeRF uses N=15 (max_logscale=14) for xyz -> 93 channels and N=4
(max_logscale=3) for dirs -> 27 channels (train_mask_grid_sample.py:77-78,91-92).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def posenc_dims(n_freqs: int, in_dim: int = 3) -> int:
    return in_dim * (1 + 2 * n_freqs)


def frequencies(max_logscale: int, n_freqs: int, logscale: bool = True):
    if logscale:
        return 2.0 ** np.linspace(0.0, float(max_logscale), n_freqs)
    return np.linspace(1.0, 2.0 ** max_logscale, n_freqs)


def posenc(x, n_freqs: int, max_logscale: int | None = None,
           logscale: bool = True):
    """Frequency-encode the last axis of x.

    x: (..., D). Returns (..., D*(1+2*n_freqs)) with channel layout
    [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] — identical to the
    reference's loop order (models/nerf.py:25-30).
    """
    if max_logscale is None:
        max_logscale = n_freqs - 1  # reference: PosEmbedding(N-1, N)
    freqs = frequencies(max_logscale, n_freqs, logscale)
    # One fused multiply: (..., D) x (F,) -> (..., F, D)
    xb = x[..., None, :] * jnp.asarray(freqs, dtype=x.dtype)[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per frequency: (..., F, 2, D) -> (..., F*2*D)
    enc = jnp.stack([sin, cos], axis=-2)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)
