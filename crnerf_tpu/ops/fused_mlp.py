"""Fused positional-encoding + NeRF-MLP evaluation as one Pallas TPU kernel.

The reference's hot loop is 11 separate torch GEMMs per chunk
(/root/reference/models/nerf.py:137-182 inside rendering.py:110-114); every
intermediate (N, 256) activation round-trips through device memory. Here the
whole chain — frequency encoding, 8x256 trunk with the skip at layer 4, the
sigma head, and the direction branch down to the 64-dim cross-ray feature —
runs inside ONE kernel per tile of points: weights (~0.6M params, ~2.4 MB
fp32) live in VMEM for the entire grid, activations never leave VMEM, and
every matmul hits the MXU with fp32 accumulation.

Layout: points are processed in (TILE, .) blocks over a 1-D grid. All
feature dims are zero-padded to lane multiples (128) at trace time — the
pads are mathematically inert (zero rows/cols) and keep Mosaic on the fast
path.

``reference_mlp_apply`` is the pure-jnp twin used for equivalence tests and
as the CPU/interpret fallback.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class MlpParams(NamedTuple):
    """Dense weights in (in, out) layout, biases (out,).

    trunk_w[0]: (Dxyz, W); trunk_w[i>0]: (W or W+Dxyz, W) — the skip layer
    consumes cat([x_emb, h]) with x_emb FIRST (reference models/nerf.py:170).
    """

    trunk_w: Tuple[jax.Array, ...]
    trunk_b: Tuple[jax.Array, ...]
    sigma_w: jax.Array        # (W, 1)
    sigma_b: jax.Array        # (1,)
    final_w: jax.Array        # (W, W)   xyz_encoding_final
    final_b: jax.Array
    dir_w: jax.Array          # (W + Ddir, W//2)
    dir_b: jax.Array
    feat_w: jax.Array         # (W//2, C)
    feat_b: jax.Array


def mlp_params_from_flax(flax_params: Dict, depth: int = 8,
                         skips: Tuple[int, ...] = (4,)) -> MlpParams:
    """Extract a NerfMLP flax param tree (crnerf_tpu.models.nerf_mlp) into
    the kernel's flat layout."""
    p = flax_params
    tw, tb = [], []
    for i in range(depth):
        layer = p[f"xyz_encoding_{i + 1}"]
        tw.append(jnp.asarray(layer["kernel"]))
        tb.append(jnp.asarray(layer["bias"]))
    return MlpParams(
        trunk_w=tuple(tw),
        trunk_b=tuple(tb),
        sigma_w=jnp.asarray(p["sigma"]["kernel"]),
        sigma_b=jnp.asarray(p["sigma"]["bias"]),
        final_w=jnp.asarray(p["xyz_encoding_final"]["kernel"]),
        final_b=jnp.asarray(p["xyz_encoding_final"]["bias"]),
        dir_w=jnp.asarray(p["dir_encoding"]["kernel"]),
        dir_b=jnp.asarray(p["dir_encoding"]["bias"]),
        feat_w=jnp.asarray(p["feature"]["kernel"]),
        feat_b=jnp.asarray(p["feature"]["bias"]),
    )


# ------------------------------------------------------------------ jnp ref
def _posenc(x, n_freqs: int):
    """Interleaved [x, sin(f0 x), cos(f0 x), ...] like core.encoding.posenc
    (reference models/nerf.py:25-30)."""
    freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    xb = x[..., None, :] * jnp.asarray(freqs, x.dtype)[:, None]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    return jnp.concatenate(
        [x, enc.reshape(*x.shape[:-1], -1)], axis=-1
    )


def reference_mlp_apply(params: MlpParams, xyz, dirs, n_emb_xyz: int,
                        n_emb_dir: int, skips: Tuple[int, ...] = (4,)):
    """Pure-jnp twin of the kernel: xyz (N,3), dirs (N,3) ->
    (N, C+1) [sigmoid features, softplus sigma]."""
    x = _posenc(xyz, n_emb_xyz)
    d = _posenc(dirs, n_emb_dir)
    h = x
    for i, (w, b) in enumerate(zip(params.trunk_w, params.trunk_b)):
        if i in skips:
            h = jnp.concatenate([x, h], -1)
        h = jax.nn.relu(h @ w + b)
    sigma = jax.nn.softplus(h @ params.sigma_w + params.sigma_b)
    hf = h @ params.final_w + params.final_b
    dd = jnp.concatenate([hf, d], -1)
    dd = jax.nn.relu(dd @ params.dir_w + params.dir_b)
    feat = jax.nn.sigmoid(dd @ params.feat_w + params.feat_b)
    return jnp.concatenate([feat, sigma], -1)


# --------------------------------------------------------------- the kernel
def _make_kernel(n_layers: int, skips: Tuple[int, ...], n_emb_xyz: int,
                 n_emb_dir: int, d_xyz_pad: int, d_dir_pad: int,
                 c_out: int, compute_dtype):
    n_f_xyz = n_emb_xyz
    n_f_dir = n_emb_dir
    freqs_xyz = (2.0 ** np.linspace(0.0, n_f_xyz - 1, n_f_xyz)).astype(
        np.float32
    )
    freqs_dir = (2.0 ** np.linspace(0.0, n_f_dir - 1, n_f_dir)).astype(
        np.float32
    )

    def encode(v3, freqs, out_dim):
        """(T, 3) -> (T, out_dim) zero-padded interleaved posenc."""
        t = v3.shape[0]
        cols = [v3]
        for f in freqs:
            xb = v3 * f
            s, c = jnp.sin(xb), jnp.cos(xb)
            cols.append(s)
            cols.append(c)
        enc = jnp.concatenate(cols, axis=-1)
        pad = out_dim - enc.shape[-1]
        if pad:
            enc = jnp.concatenate(
                [enc, jnp.zeros((t, pad), enc.dtype)], axis=-1
            )
        return enc

    def kernel(xyz_ref, dir_ref, *refs):
        # refs: trunk w/b pairs..., sigma_w, sigma_b, final_w, final_b,
        #       dir_w, dir_b, feat_w, feat_b, out_ref
        out_ref = refs[-1]
        widx = 0

        def nxt():
            nonlocal widx
            r = refs[widx]
            widx += 1
            return r

        dt = compute_dtype
        x = encode(xyz_ref[:, :3], freqs_xyz, d_xyz_pad).astype(dt)
        h = x
        for i in range(n_layers):
            w = nxt()[:]
            b = nxt()[:]
            if i in skips:
                h = jnp.concatenate([x, h], axis=-1)
            h = jnp.dot(h, w.astype(dt),
                        preferred_element_type=jnp.float32) + b
            h = jnp.maximum(h, 0.0).astype(dt)

        sigma_w = nxt()[:]
        sigma_b = nxt()[:]
        # sigma in fp32 (compositing is exp-sensitive)
        sigma = jnp.dot(h.astype(jnp.float32), sigma_w.astype(jnp.float32),
                        preferred_element_type=jnp.float32) + sigma_b
        sigma = jax.nn.softplus(sigma)  # (T, pad128) col 0 meaningful

        final_w = nxt()[:]
        final_b = nxt()[:]
        hf = jnp.dot(h, final_w.astype(dt),
                     preferred_element_type=jnp.float32) + final_b

        d = encode(dir_ref[:, :3], freqs_dir, d_dir_pad).astype(dt)
        dir_w = nxt()[:]
        dir_b = nxt()[:]
        dd = jnp.concatenate([hf.astype(dt), d], axis=-1)
        dd = jnp.dot(dd, dir_w.astype(dt),
                     preferred_element_type=jnp.float32) + dir_b
        dd = jnp.maximum(dd, 0.0).astype(dt)

        feat_w = nxt()[:]
        feat_b = nxt()[:]
        feat = jnp.dot(dd, feat_w.astype(dt),
                       preferred_element_type=jnp.float32) + feat_b
        feat = jax.nn.sigmoid(feat)  # (T, c_pad)

        out = jnp.concatenate(
            [feat[:, :c_out], sigma[:, :1]], axis=-1
        )
        pad = out_ref.shape[-1] - out.shape[-1]
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((out.shape[0], pad), out.dtype)], axis=-1
            )
        out_ref[:, :] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_emb_xyz", "n_emb_dir", "tile", "compute_dtype",
                     "interpret", "skips"),
)
def fused_mlp_apply(
    params: MlpParams,
    xyz: jax.Array,            # (N, 3)
    dirs: jax.Array,           # (N, 3) per-POINT view dirs (pre-broadcast)
    n_emb_xyz: int = 15,
    n_emb_dir: int = 4,
    tile: int = 512,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    skips: Tuple[int, ...] = (4,),
) -> jax.Array:
    """-> (N, C+1) = [sigmoid features, softplus sigma]; matches
    ``reference_mlp_apply`` to fp32 tolerance."""
    n = xyz.shape[0]
    c_out = params.feat_w.shape[1]
    d_xyz = 3 * (1 + 2 * n_emb_xyz)
    d_dir = 3 * (1 + 2 * n_emb_dir)
    d_xyz_pad = _round_up(d_xyz, 128)
    d_dir_pad = _round_up(d_dir, 128)
    width = params.trunk_w[1].shape[1] if len(params.trunk_w) > 1 else (
        params.trunk_w[0].shape[1]
    )

    n_pad = _round_up(max(n, tile), tile)
    xyz_p = jnp.pad(xyz, ((0, n_pad - n), (0, 0))).astype(jnp.float32)
    dirs_p = jnp.pad(dirs, ((0, n_pad - n), (0, 0))).astype(jnp.float32)
    # pad point coords' lane dim to 128 for clean VMEM tiles
    xyz_p = jnp.pad(xyz_p, ((0, 0), (0, 128 - 3)))
    dirs_p = jnp.pad(dirs_p, ((0, 0), (0, 128 - 3)))

    # ---- zero-pad every weight to lane/sublane multiples
    def pad2(w, rows, cols):
        return jnp.pad(
            w, ((0, rows - w.shape[0]), (0, cols - w.shape[1]))
        )

    def pad1(b, cols):
        return jnp.pad(b, (0, cols - b.shape[0])).reshape(1, -1)

    w_pad = _round_up(width, 128)
    weight_args = []
    for i, (w, b) in enumerate(zip(params.trunk_w, params.trunk_b)):
        in_dim = d_xyz_pad if i == 0 else (
            d_xyz_pad + w_pad if i in skips else w_pad
        )
        if i in skips and i > 0:
            # skip concatenates [x_pad | h]: embed original rows into the
            # padded layout — x rows (d_xyz real) land at [0:d_xyz],
            # h rows at [d_xyz_pad : d_xyz_pad + width].
            wp = jnp.zeros((in_dim, w_pad), w.dtype)
            wp = wp.at[:d_xyz, :width].set(w[:d_xyz])
            wp = wp.at[d_xyz_pad:d_xyz_pad + width, :width].set(w[d_xyz:])
        else:
            wp = pad2(w, in_dim, w_pad)
        weight_args.append(wp)
        weight_args.append(pad1(b, w_pad))

    sigma_w = pad2(params.sigma_w, w_pad, 128)
    sigma_b = pad1(params.sigma_b, 128)
    final_w = pad2(params.final_w, w_pad, w_pad)
    final_b = pad1(params.final_b, w_pad)
    half = params.dir_w.shape[1]
    half_pad = _round_up(half, 128)
    # dir layer consumes cat([h_final | d_pad]) in padded layout
    dir_w = jnp.zeros((w_pad + d_dir_pad, half_pad), params.dir_w.dtype)
    dir_w = dir_w.at[:width, :half].set(params.dir_w[:width])
    dir_w = dir_w.at[w_pad:w_pad + d_dir, :half].set(params.dir_w[width:])
    dir_b = pad1(params.dir_b, half_pad)
    c_pad = _round_up(c_out, 128)
    feat_w = pad2(params.feat_w, half_pad, c_pad)
    feat_b = pad1(params.feat_b, c_pad)

    weight_args += [sigma_w, sigma_b, final_w, final_b, dir_w, dir_b,
                    feat_w, feat_b]
    if compute_dtype != jnp.float32:
        # pre-cast weight MATRICES once at trace time — casting 0.6M values
        # inside the kernel would repeat per grid step. sigma_w (index -8)
        # stays fp32 (sigma path is precision-sensitive); biases stay fp32
        # (added to fp32 accumulators).
        cast = []
        for i, w in enumerate(weight_args):
            is_bias = w.shape[0] == 1
            is_sigma_w = i == len(weight_args) - 8
            cast.append(
                w if (is_bias or is_sigma_w) else w.astype(compute_dtype)
            )
        weight_args = cast

    out_cols = _round_up(c_out + 1, 128)
    kernel = _make_kernel(
        len(params.trunk_w), skips, n_emb_xyz, n_emb_dir,
        d_xyz_pad, d_dir_pad, c_out, compute_dtype,
    )

    grid = (n_pad // tile,)
    point_spec = pl.BlockSpec(
        (tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    weight_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weight_args
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[point_spec, point_spec] + weight_specs,
        out_specs=pl.BlockSpec(
            (tile, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
        interpret=interpret,
    )(xyz_p, dirs_p, *weight_args)
    return out[:n, : c_out + 1]
