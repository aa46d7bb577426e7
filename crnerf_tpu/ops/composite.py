"""Alpha-compositing as a Pallas TPU kernel.

Reference math (/root/reference/models/rendering.py:118-143): deltas from
consecutive z (final delta 1e2), alpha = 1 - exp(-delta * relu(sigma)),
transmittance = shifted exclusive cumprod, weights = alpha * T, outputs =
weighted feature sum + expected depth. The pure-jnp twin lives in
``crnerf_tpu.core.compositing``.

Kernel shape: one grid step processes a (R_TILE, S) block of rays (R_TILE
auto-clamped to the VMEM budget). The exclusive transmittance cumprod runs
as O(log S) static-shift doubling multiplies on the VPU (Mosaic lowers
neither cumprod nor dynamic value slicing), the weighted feature reduction
accumulates in static 32-sample chunks, and the (N, S, C) feature tensor
is read exactly once from HBM — alphas and per-sample products never
materialize there. Verified against the jnp twin on real TPU to 1e-7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crnerf_tpu.core.compositing import DELTA_INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _composite_kernel(feat_ref, sigma_ref, z_ref, w_ref, fmap_ref,
                      depth_ref, *, s: int):
    """feat (R, S, C), sigma (R, S), z (R, S) ->
    w (R, S), fmap (R, C), depth (R, 128 col0)."""
    sigmas = jnp.maximum(sigma_ref[:, :], 0.0)
    z = z_ref[:, :]
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1],
         jnp.zeros((z.shape[0], 1), z.dtype)],
        axis=-1,
    )
    # the LAST REAL sample (index s-1, not the padded tail) gets the
    # infinite-extent delta (rendering.py:122)
    col = jax.lax.broadcasted_iota(jnp.int32, deltas.shape, 1)
    deltas = jnp.where(col == s - 1, DELTA_INF, deltas)
    alphas = 1.0 - jnp.exp(-deltas * sigmas)          # (R, S)
    one_m = 1.0 - alphas

    r = alphas.shape[0]

    # Weights in one shot: w = alpha * exclusive-cumprod(1 - alpha). The
    # cumprod runs on the (R, S) block via log-free prefix products
    # expressed with static unrolled doubling (Mosaic cannot dynamic-slice
    # VMEM values; everything below uses static indices only).
    # exclusive cumprod via log-doubling (cumprod itself doesn't lower on
    # Mosaic): O(log S) static-shift multiplies on the VPU
    p = jnp.concatenate(
        [jnp.ones((r, 1), jnp.float32), one_m[:, :-1]], axis=-1
    )
    shift = 1
    s_total = p.shape[-1]
    while shift < s_total:
        p = p * jnp.concatenate(
            [jnp.ones((r, shift), jnp.float32), p[:, :-shift]], axis=-1
        )
        shift *= 2
    transmittance = p
    weights = alphas * transmittance                   # (R, S_pad)
    w_ref[:, :] = weights

    # feature map = sum_s w[:, s] * feat[:, s, :], reduced in static
    # 32-sample chunks (batched dot_general doesn't lower on Mosaic; full
    # (R, S, C) temporaries would blow scoped VMEM)
    c = fmap_ref.shape[-1]
    fmap = jnp.zeros((r, c), jnp.float32)
    step = 32
    for s0 in range(0, weights.shape[-1], step):
        w_chunk = jnp.expand_dims(
            jax.lax.slice_in_dim(weights, s0, s0 + step, axis=1), -1
        )
        f_chunk = feat_ref[:, s0:s0 + step, :]
        fmap = fmap + jnp.sum(w_chunk * f_chunk, axis=1)
    fmap_ref[:, :] = fmap
    depth = jnp.sum(weights * z, axis=-1, keepdims=True)
    depth_ref[:, :] = jnp.broadcast_to(depth, depth_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("ray_tile", "interpret")
)
def composite_pallas(features, sigmas, z_vals, ray_tile: int = 256,
                     interpret: bool = False):
    """features (N, S, C), sigmas (N, S), z_vals (N, S) ->
    (weights (N, S), feature_map (N, C), depth (N,)).

    Deterministic path only (noise_std=0 — eval). Training uses the jnp
    twin, which is differentiable.
    """
    n, s, c = features.shape
    s_pad = _round_up(s, 128)
    c_pad = _round_up(c, 128)
    # clamp the ray tile so the (tile, s_pad, c_pad) feature block plus
    # outputs stay within ~8 MB of VMEM (v5e has 16 MB less double-buffers)
    budget = 4 * 1024 * 1024
    max_tile = max(8, budget // (s_pad * c_pad * 4))
    ray_tile = min(ray_tile, _round_up(max_tile, 8) if max_tile >= 8 else 8)
    n_pad = _round_up(max(n, ray_tile), ray_tile)

    f = jnp.zeros((n_pad, s_pad, c_pad), jnp.float32)
    f = f.at[:n, :s, :c].set(features.astype(jnp.float32))
    sg = jnp.zeros((n_pad, s_pad), jnp.float32)
    sg = sg.at[:n, :s].set(sigmas.astype(jnp.float32))
    # padded z continue the last value so padded deltas are 0 -> alpha 0
    z = jnp.concatenate(
        [z_vals.astype(jnp.float32),
         jnp.broadcast_to(z_vals[:, -1:], (n, s_pad - s))], axis=-1
    ) if s_pad > s else z_vals.astype(jnp.float32)
    z = jnp.concatenate(
        [z, jnp.zeros((n_pad - n, s_pad), jnp.float32)], axis=0
    ) if n_pad > n else z

    grid = (n_pad // ray_tile,)
    w, fmap, depth = pl.pallas_call(
        functools.partial(_composite_kernel, s=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ray_tile, s_pad, c_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ray_tile, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(f, sg, z)
    return w[:n, :s], fmap[:n, :c], depth[:n, 0]
