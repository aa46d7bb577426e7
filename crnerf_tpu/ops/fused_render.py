"""Fully-fused volume rendering: PE+MLP+alpha-compositing in ONE Pallas
TPU kernel (forward), with a matching recompute backward kernel.

Motivation (step profile, BASELINE.md): with the MLP kernel alone, the
per-point feature block (N*S, 128) fp32 round-trips HBM between the kernel
and XLA's compositing einsum — plus layout copies for the (G, B, S, C)
views and an equally large outer-product cotangent in backward, ~30 ms of
the 180 ms step at CR-NeRF train shapes. Here the features NEVER leave
VMEM: each grid step processes R_TILE whole rays (R_TILE * S points), runs
the 11-layer MLP, composites along the sample axis in-kernel, and writes
only per-ray results:

  out_ray (N_rays, 128) f32 — [feature_map(:C) | depth(col C) | zeros]
  weights (N_rays, S)   f32

Reference math (/root/reference/models/rendering.py:118-143): deltas from
consecutive z (last = 1e2), alpha = 1 - exp(-delta * relu(sigma + noise)),
transmittance = shifted exclusive cumprod, weights = alpha * T, outputs =
weighted feature sum + expected depth.

Mosaic-friendly building blocks (no gathers, no relayouts):
- flat (T,1) <-> per-ray (R,S) conversions as mask matmuls with the
  iota masks A[r,t] = [t // S == r] and B[t,s] = [t % S == s]
- exclusive cumprod along the S lanes via static-shift log-doubling
  (same scheme as ops/composite.py)
- the weighted feature reduction as ONE (R,T)@(T,C) MXU matmul against a
  mask-assembled per-ray weight matrix
- compositing backward via lane-reversed suffix sums; the 1/(1-alpha)
  term is clamped at 1e-30 (the pure-jnp twin's cumprod VJP divides by
  the same quantity unguarded)

Backward produces WEIGHT gradients only (rays/z/noise carry no trainable
inputs — z is detached by design, SURVEY.md §7), accumulated across the
sequential grid in constant-index VMEM blocks exactly like
ops/fused_mlp's backward.

The MLP math is intentionally duplicated from ops/fused_mlp (same weight
layout/prep helpers are imported); the un-fused kernels remain the
fallback path behind ``Config.pallas_render``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Raised Mosaic scoped-VMEM budget for the big-tile stash kernels: the
# 16 MB default is an XLA flag default, not the physical VMEM (128 MB on
# v5e). 100M fits the shipped tiles; CRNERF_VMEM_MB overrides for tile
# A/Bs (the 8192-pt fwd tile needs ~100.6M — BASELINE.md 2026-08-19).
_VMEM_LIMIT = int(_os.environ.get("CRNERF_VMEM_MB", 100)) * 1024 * 1024


def _fwd_compiler_params():
    """CompilerParams for the FORWARD kernels, whose 1-D ray-tile grid is
    embarrassingly parallel (every output block is written by exactly one
    grid step). Declaring that to Mosaic via dimension_semantics measured
    +0.9% end-to-end (169.7k vs 168.2k rays/s, 2026-08-19 A/B sweep) and
    is the default; CRNERF_FWD_ARBITRARY=1 restores the conservative
    semantics for A/B. The backward kernels accumulate weight grads
    across grid steps (const out specs) and must keep 'arbitrary'."""
    import os

    if os.environ.get("CRNERF_FWD_ARBITRARY"):
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=("parallel",),
    )


def _pow2_floor(x: int) -> int:
    """Largest power of two <= x (x >= 1)."""
    return 1 << (x.bit_length() - 1)

from crnerf_tpu.core.compositing import DELTA_INF
from crnerf_tpu.ops.fused_mlp import (
    LANE,
    MlpParams,
    _prep_wargs,
    _round_up,
    _ungroup_grads,
    dir_block_encode,
    grouped_encode,
    reference_mlp_apply,
)


# ------------------------------------------------------------ jnp twin
def reference_render_apply(params: MlpParams, xyz, dirs, z_vals,
                           noise, n_emb_xyz: int, n_emb_dir: int,
                           skips: Tuple[int, ...] = (4,)):
    """Pure-jnp twin: xyz (N,S,3), dirs (N,3), z_vals (N,S), noise (N,S)
    -> (feature_map (N,C), weights (N,S), depth (N,))."""
    n, s, _ = xyz.shape
    dirs_pt = jnp.broadcast_to(dirs[:, None, :], (n, s, 3)).reshape(-1, 3)
    out = reference_mlp_apply(params, xyz.reshape(-1, 3), dirs_pt,
                              n_emb_xyz, n_emb_dir, skips)
    c = out.shape[-1] - 1
    feats = out[:, :c].reshape(n, s, c)
    sigmas = out[:, c].reshape(n, s)
    deltas = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1],
         jnp.full_like(z_vals[:, :1], DELTA_INF)], -1
    )
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas + noise))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1]], -1
    )
    weights = alphas * jnp.cumprod(shifted, -1)
    fmap = jnp.einsum("ns,nsc->nc", weights, feats,
                      preferred_element_type=jnp.float32)
    depth = jnp.sum(weights * z_vals, -1)
    return fmap, weights, depth


# ----------------------------------------------------- in-kernel helpers
def _ray_masks(r_tile: int, s: int, dtype):
    """A (R,T): [t//S == r]; B (T,S): [t%S == s] as traced iota masks."""
    t = r_tile * s
    rows_a = jax.lax.broadcasted_iota(jnp.int32, (r_tile, t), 0)
    cols_a = jax.lax.broadcasted_iota(jnp.int32, (r_tile, t), 1)
    a = (cols_a // s == rows_a).astype(dtype)
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    b = (rows_b % s == cols_b).astype(dtype)
    return a, b


def _flat_to_rs(col, a, b):
    """(T,1) column -> (R,S): A @ (broadcast(col) * B)."""
    t, s = b.shape
    spread = jnp.broadcast_to(col, (t, s)) * b
    return jax.lax.dot_general(
        a, spread, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rs_to_flat(mat_rs, a, b):
    """(R,S) -> (T,1) column: rowsum((A^T @ mat) * B)."""
    d = jax.lax.dot_general(
        a, mat_rs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, S)
    return jnp.sum(d * b, axis=1, keepdims=True)


def _exclusive_cumprod_lanes(x):
    """(R, S) exclusive cumprod along lanes via static-shift doubling."""
    r, s = x.shape
    p = jnp.concatenate([jnp.ones((r, 1), jnp.float32), x[:, :-1]], -1)
    shift = 1
    while shift < s:
        p = p * jnp.concatenate(
            [jnp.ones((r, shift), jnp.float32), p[:, :-shift]], -1
        )
        shift *= 2
    return p


def _reverse_exclusive_cumsum_lanes(x):
    """(R, S) suffix sums EXCLUDING self: out[:, i] = sum_{k>i} x[:, k]."""
    r, s = x.shape
    p = jnp.concatenate([x[:, 1:], jnp.zeros((r, 1), jnp.float32)], -1)
    shift = 1
    while shift < s:
        p = p + jnp.concatenate(
            [p[:, shift:], jnp.zeros((r, shift), jnp.float32)], -1
        )
        shift *= 2
    return p


def _composite_fwd_math(sigma_col, z, noise, a, b, s: int):
    """Shared fwd compositing: flat sigma column + per-ray z/noise ->
    (alphas, transmittance, weights, w_big) all in (R,S)/(R,T)."""
    sigma_rs = _flat_to_rs(sigma_col, a, b)                  # (R, S)
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.zeros((z.shape[0], 1), z.dtype)], -1
    )
    col = jax.lax.broadcasted_iota(jnp.int32, deltas.shape, 1)
    deltas = jnp.where(col == s - 1, DELTA_INF, deltas)
    act = jnp.maximum(sigma_rs + noise, 0.0)
    alphas = 1.0 - jnp.exp(-deltas * act)
    trans = _exclusive_cumprod_lanes(1.0 - alphas)
    weights = alphas * trans
    # per-ray weight matrix over the tile's points:
    # W_big[r, t] = weights[r, t % S] * [t // S == r]
    w_spread = jax.lax.dot_general(
        weights, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, T)
    w_big = w_spread * a
    return sigma_rs, deltas, act, alphas, trans, weights, w_big


def _build_enc_t(od, z, a, b, n_emb_xyz: int, scratch,
                 exact: bool = True):
    """In-kernel TRANSPOSED encode: od (R,8) = [o|d|pad] per-ray rows and
    z (R,S) -> fills ``scratch`` (enc_rows, T) with
    [x rows (3) | sin rows (3F) | cos rows (3F) | junk] and returns it.

    xyz is built by spreading o/d to points with the ray mask (one MXU
    contraction each) and broadcasting the z row; the 2^k*x argument grid
    is ONE (3F, 8)@(8, T) matmul against a power-of-2 scale/select matrix
    (exact: single product per output, power-of-2 multiplier), then one
    sin and one cos sweep over the whole block — measured hidden under
    the grid's DMA pipeline (scripts/spike_sublane_stores.py). The junk
    tail rows meet zero weight rows, contributing exactly 0.
    """
    f32 = jnp.float32
    o = od[:, 0:3]
    d = od[:, 3:6]
    spread = lambda m: jax.lax.dot_general(  # noqa: E731
        m, a, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (3, T)
    o_sp, d_sp = spread(o), spread(d)
    z_sp = jax.lax.dot_general(
        z, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (R, T)
    z_row = jnp.sum(z_sp * a, axis=0, keepdims=True)   # (1, T)
    xyz_t = o_sp + d_sp * z_row                         # (3, T)

    f = n_emb_xyz
    scratch[0:3, :] = xyz_t
    if exact:
        rows3f = _round_up(3 * f, 8)
        ri = jax.lax.broadcasted_iota(jnp.int32, (rows3f, 8), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows3f, 8), 1)
        # EXACT powers of two via the exponent bit field — jnp.exp2
        # computes exp(x ln 2) and lands ulps off, which the 2^14-octave
        # sin amplifies to ~2e-2 encode error (~10% trunk-grad error)
        pow2 = jax.lax.bitcast_convert_type((ri // 3 + 127) << 23, f32)
        dmat = jnp.where((ci == ri % 3) & (ri < 3 * f), pow2, 0.0)
        xyz_t8 = jnp.concatenate(
            [xyz_t, jnp.zeros((5, xyz_t.shape[1]), f32)], axis=0
        )
        args = jax.lax.dot_general(
            dmat, xyz_t8, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (rows3f, T)
        # sin block first, cos second: the cos store overwrites the sin
        # store's pad rows (3+3F .. 3+rows3f) with its valid head rows
        scratch[3:3 + rows3f, :] = jnp.sin(args)
        scratch[3 + 3 * f:3 + 3 * f + rows3f, :] = jnp.cos(args)
        return scratch[:, :]
    # anchored double-angle recurrence (same ladder as the stream path's
    # fast_sincos: exact sin/cos every ANCHOR_SPAN octaves, ~2e-4 error,
    # bf16-gated): 4x fewer transcendental elements than the exact sweep
    from crnerf_tpu.ops.fused_mlp import ANCHOR_SPAN

    t_cols = xyz_t.shape[1]
    for a0 in range(0, f, ANCHOR_SPAN):
        scale = float(2.0 ** a0)  # python float: exact power of two
        va = xyz_t * scale
        s_, c_ = jnp.sin(va), jnp.cos(va)
        scratch[3 + 3 * a0:3 + 3 * a0 + 3, :] = s_
        scratch[3 + 3 * f + 3 * a0:3 + 3 * f + 3 * a0 + 3, :] = c_
        for k in range(a0 + 1, min(a0 + ANCHOR_SPAN, f)):
            s_, c_ = 2.0 * s_ * c_, 1.0 - 2.0 * s_ * s_
            scratch[3 + 3 * k:3 + 3 * k + 3, :] = s_
            scratch[3 + 3 * f + 3 * k:3 + 3 * f + 3 * k + 3, :] = c_
    rows = scratch.shape[0]
    if rows > 3 + 6 * f:  # zero the pad tail (uninit VMEM may hold NaN)
        scratch[3 + 6 * f:rows, :] = jnp.zeros(
            (rows - 3 - 6 * f, t_cols), f32
        )
    return scratch[:, :]


def enc_t_rows(n_emb_xyz: int) -> int:
    """Scratch row count for _build_enc_t (covers the cos-store tail)."""
    return 3 + 3 * n_emb_xyz + _round_up(3 * n_emb_xyz, 8)


# ---------------------------------------------------------- MLP snippets
def _mlp_fwd(enc_mm, nxt, n_layers, skips, dt, keep_acts: bool,
             dir_term=None):
    """In-kernel MLP forward. ``enc_mm(w_ref)`` computes the encode
    contribution (T, out) for an encode-consuming weight ref (the stream
    kernels matmul a per-point encode block; the rays-in kernels contract
    the transposed in-kernel encode). ``nxt()`` yields the weight refs in
    _prep_wargs order. ``dir_term(wd_e_ref)`` computes the dir-branch
    contribution (T, half). Returns (layers, acts, z_sig, hf, dd, feat) —
    prev-activations only kept when keep_acts."""
    f32 = jnp.float32

    def mm(a, w):
        return jnp.dot(a.astype(dt), w.astype(dt),
                       preferred_element_type=f32)

    layers = []
    acts = []
    w0, b0 = nxt(), nxt()
    h = enc_mm(w0) + b0[:]
    h = jnp.maximum(h, 0.0).astype(dt)
    layers.append(("enc", (w0, b0), None))
    acts.append(h)
    for i in range(1, n_layers):
        if i in skips:
            we, wh, bb = nxt(), nxt(), nxt()
            h_new = enc_mm(we) + mm(h, wh[:]) + bb[:]
            layers.append(("skip", (we, wh, bb), h if keep_acts else None))
        else:
            ww, bb = nxt(), nxt()
            h_new = mm(h, ww[:]) + bb[:]
            layers.append(("dense", (ww, bb), h if keep_acts else None))
        h = jnp.maximum(h_new, 0.0).astype(dt)
        acts.append(h)

    sw, sb = nxt(), nxt()
    # sigma head at compute dtype (f32 accumulation either way). h is
    # already bf16-quantized at bf16 configs, so only the weight rounding
    # changes (~0.4% relative, far under the compositing tolerances).
    # Measured ~neutral on the chip (the f32 matmul was not a bottleneck)
    # but keeps the kernel's dtype policy uniform.
    z_sig = mm(h, sw[:]) + sb[:]
    fw, fb = nxt(), nxt()
    hf = (mm(h, fw[:]) + fb[:]).astype(dt)
    wd_h, wd_e, bd = nxt(), nxt(), nxt()
    zd = mm(hf, wd_h[:]) + dir_term(wd_e) + bd[:]
    dd = jnp.maximum(zd, 0.0).astype(dt)
    fw2, fb2 = nxt(), nxt()
    z_feat = mm(dd, fw2[:]) + fb2[:]
    feat = jax.nn.sigmoid(z_feat)
    return layers, acts, z_sig, hf, dd, feat


# ----------------------------------------------------------- stash layout
def _stash_cols(n_layers: int, width: int, half: int) -> int:
    """bf16 activation-stash columns: trunk acts + hf + dd (all exactly the
    bf16 values the forward used, so the stash backward bit-matches the
    recompute backward)."""
    return n_layers * width + width + half


# ---------------------------------------------------------------- kernels
def _make_render_fwd_kernel(n_layers, skips, c_out, compute_dtype,
                            r_tile, s, n_emb_xyz, rays_in,
                            exact_encode=True, stash=False):
    def kernel(in0_ref, z_ref, noise_ref, dir_ref, *refs):
        if stash:
            out_ray_ref, w_ref, stash_ref, enc_stash_ref = refs[-5:-1]
            w_refs = refs[:-5]
        else:
            out_ray_ref, w_ref = refs[-3], refs[-2]
            w_refs = refs[:-3]
        scratch = refs[-1]
        widx = 0

        def nxt():
            nonlocal widx
            r = w_refs[widx]
            widx += 1
            return r

        a, b = _ray_masks(r_tile, s, jnp.float32)
        dt = compute_dtype
        z = z_ref[:, :]

        def dir_term(wd_e_ref):
            # per-ray dir contribution, spread to the tile's points
            contrib = jnp.dot(
                dir_ref[:, :].astype(dt), wd_e_ref[:].astype(dt),
                preferred_element_type=jnp.float32,
            )  # (R, half)
            return jax.lax.dot_general(
                a, contrib, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, half)

        if rays_in:
            enc_t = _build_enc_t(in0_ref[:, :], z, a, b, n_emb_xyz,
                                 scratch, exact=exact_encode)
            rows = enc_t.shape[0]

            def enc_mm(w_ref_):
                return jax.lax.dot_general(
                    enc_t.astype(dt), w_ref_[0:rows, :].astype(dt),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            enc = in0_ref[:, :]

            def enc_mm(w_ref_):
                return jnp.dot(enc.astype(dt), w_ref_[:].astype(dt),
                               preferred_element_type=jnp.float32)

        _, acts, z_sig, hf, dd, feat = _mlp_fwd(
            enc_mm, nxt, n_layers, skips, compute_dtype, keep_acts=False,
            dir_term=dir_term,
        )
        if stash:
            # Activation stash consumed by the no-recompute backward:
            # [acts_0..acts_{L-1} | hf | dd], plus the transposed encode
            # block in its natural (rows, T) layout. Stored at
            # compute_dtype — exactly the values the forward's matmuls
            # consumed, so the stash backward bit-matches recompute.
            w = acts[0].shape[1]
            for i, h_ in enumerate(acts):
                stash_ref[:, i * w:(i + 1) * w] = h_.astype(dt)
            stash_ref[:, n_layers * w:(n_layers + 1) * w] = hf.astype(dt)
            half = dd.shape[1]
            stash_ref[
                :, (n_layers + 1) * w:(n_layers + 1) * w + half
            ] = dd.astype(dt)
            enc_stash_ref[:, :] = enc_t.astype(dt)
        sigma = jax.nn.softplus(z_sig[:, :1])            # (T, 1)
        noise = noise_ref[:, :]
        _, _, _, _, _, weights, w_big = _composite_fwd_math(
            sigma, z, noise, a, b, s
        )
        fmap = jnp.dot(w_big, feat, preferred_element_type=jnp.float32)
        depth = jnp.sum(weights * z, axis=-1, keepdims=True)

        col = jax.lax.broadcasted_iota(jnp.int32, fmap.shape, 1)
        depth_b = jnp.broadcast_to(depth, fmap.shape)
        out_ray_ref[:, :] = jnp.where(
            col < c_out, fmap, jnp.where(col == c_out, depth_b, 0.0)
        )
        w_ref[:, :] = weights

    return kernel


def _make_render_bwd_kernel(n_layers, skips, c_out, compute_dtype,
                            r_tile, s, n_w, n_emb_xyz, rays_in,
                            exact_encode=True):
    """Recompute MLP+composite, backprop through both, accumulate weight
    grads in constant-index output blocks."""

    def kernel(in0_ref, z_ref, noise_ref, dir_ref, g_ray_ref, g_w_ref,
               *refs):
        w_refs = refs[:n_w]
        d_refs = refs[n_w:-1]
        scratch = refs[-1]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in d_refs:
                r[:, :] = jnp.zeros_like(r)

        widx = 0

        def nxt():
            nonlocal widx
            i = widx
            widx += 1
            return w_refs[i], d_refs[i]

        dt = compute_dtype
        f32 = jnp.float32

        def mm_t(a_, dz):
            return jax.lax.dot_general(
                a_.astype(dt), dz.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        def mm_bt(dz, w):
            return jax.lax.dot_general(
                dz.astype(dt), w.astype(dt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )

        # ---- recompute forward (weights as (ref, dref) pairs)
        pairs = []

        def nxt_ref():
            p = nxt()
            pairs.append(p)
            return p[0]

        a, b = _ray_masks(r_tile, s, f32)
        dir_local = dir_ref[:, :]
        z = z_ref[:, :]

        def dir_term(wd_e_ref):
            contrib = jnp.dot(
                dir_local.astype(dt), wd_e_ref[:].astype(dt),
                preferred_element_type=f32,
            )
            return jax.lax.dot_general(
                a, contrib, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        if rays_in:
            enc_t = _build_enc_t(in0_ref[:, :], z, a, b, n_emb_xyz,
                                 scratch, exact=exact_encode)
            rows = enc_t.shape[0]

            def enc_mm(w_ref_):
                return jax.lax.dot_general(
                    enc_t.astype(dt), w_ref_[0:rows, :].astype(dt),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )

            def enc_grad(pair, dz):
                pair[1][0:rows, :] += jax.lax.dot_general(
                    enc_t.astype(dt), dz.astype(dt),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        else:
            enc = in0_ref[:, :]

            def enc_mm(w_ref_):
                return jnp.dot(enc.astype(dt), w_ref_[:].astype(dt),
                               preferred_element_type=f32)

            def enc_grad(pair, dz):
                pair[1][:, :] += mm_t(enc, dz)

        layers, acts, z_sig, hf, dd, feat = _mlp_fwd(
            enc_mm, nxt_ref, n_layers, skips, dt, keep_acts=True,
            dir_term=dir_term,
        )
        # pairs are appended in _prep_wargs order; recover by position:
        # trunk pairs first, then sigma(2), final(2), dir(3), feat(2)
        sigma = jax.nn.softplus(z_sig[:, :1])

        noise = noise_ref[:, :]
        (sigma_rs, deltas, act, alphas, trans, weights,
         w_big) = _composite_fwd_math(sigma, z, noise, a, b, s)

        # ---- composite backward
        g_ray = g_ray_ref[:, :]                         # (R, 128)
        col = jax.lax.broadcasted_iota(jnp.int32, g_ray.shape, 1)
        dfmap = jnp.where(col < c_out, g_ray, 0.0)      # (R, 128)
        ddepth = jnp.sum(
            jnp.where(col == c_out, g_ray, 0.0), axis=1, keepdims=True
        )                                               # (R, 1)

        # dL/dweights: direct cotangent + depth + feature-map terms.
        # feature term: dw[r,s] = sum_c dfmap[r,c] * feat[r*S+s, c]
        #   = ((dfmap @ feat^T) * A) @ B   -- (R,T) masked to own rays
        g_ft = jax.lax.dot_general(
            dfmap.astype(f32), feat.astype(f32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # (R, T)
        dw_feat = jax.lax.dot_general(
            g_ft * a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (R, S)
        dw = g_w_ref[:, :] + ddepth * z + dw_feat       # (R, S)

        # dalpha_i = T_i dw_i - (sum_{k>i} w_k dw_k) / (1 - alpha_i)
        suffix = _reverse_exclusive_cumsum_lanes(weights * dw)
        one_m = jnp.maximum(1.0 - alphas, 1e-30)
        dalpha = trans * dw - suffix / one_m
        # alpha = 1 - exp(-delta * act); act = relu(sigma_rs + noise)
        dact = dalpha * deltas * jnp.exp(-deltas * act)
        dsigma_rs = jnp.where(sigma_rs + noise > 0, dact, 0.0)
        dsigma_col = _rs_to_flat(dsigma_rs, a, b)        # (T, 1)

        # dfeat per point: W_big^T @ dfmap -> (T, 128); cols >= c_out are
        # zero already (dfmap was masked to col < c_out)
        dfeat = jax.lax.dot_general(
            w_big, dfmap.astype(f32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        # ---- MLP backward (mirrors ops/fused_mlp._make_bwd_kernel)
        n_trunk_pairs = len(pairs) - 9
        trunk_pairs = pairs[:n_trunk_pairs]
        sw, sb = pairs[n_trunk_pairs], pairs[n_trunk_pairs + 1]
        fw, fb = pairs[n_trunk_pairs + 2], pairs[n_trunk_pairs + 3]
        wd_h, wd_e, bd = (pairs[n_trunk_pairs + 4],
                          pairs[n_trunk_pairs + 5],
                          pairs[n_trunk_pairs + 6])
        fw2, fb2 = pairs[n_trunk_pairs + 7], pairs[n_trunk_pairs + 8]

        dz_feat = dfeat * feat * (1.0 - feat)
        fw2[1][:, :] += mm_t(dd, dz_feat)
        fb2[1][:, :] += jnp.sum(dz_feat, axis=0, keepdims=True)
        ddd = mm_bt(dz_feat, fw2[0][:])
        ddd = jnp.where(dd.astype(f32) > 0, ddd, 0.0)

        wd_h[1][:, :] += mm_t(hf, ddd)
        # dir weight grad: sum ddd over each ray's rows, then contract
        # with the per-ray dir block
        ddd_ray = jnp.dot(a, ddd, preferred_element_type=f32)  # (R, half)
        wd_e[1][:, :] += mm_t(dir_local, ddd_ray)
        bd[1][:, :] += jnp.sum(ddd, axis=0, keepdims=True)
        dhf = mm_bt(ddd, wd_h[0][:])

        fw[1][:, :] += mm_t(acts[-1], dhf)
        fb[1][:, :] += jnp.sum(dhf, axis=0, keepdims=True)
        dh = mm_bt(dhf, fw[0][:])

        dz_sig = dsigma_col * jax.nn.sigmoid(z_sig[:, :1])
        sig_col = jax.lax.broadcasted_iota(jnp.int32, z_sig.shape, 1)
        dz_sig_b = jnp.where(
            sig_col == 0, jnp.broadcast_to(dz_sig, z_sig.shape), 0.0
        )
        sw[1][:, :] += mm_t(acts[-1].astype(f32), dz_sig_b)
        sb[1][:, :] += jnp.sum(dz_sig_b, axis=0, keepdims=True)
        dh = dh + mm_bt(dz_sig_b, sw[0][:])

        for i in range(n_layers - 1, -1, -1):
            dz = jnp.where(acts[i].astype(f32) > 0, dh, 0.0)
            kind, _, prev = layers[i]
            if kind == "enc":
                w0p, b0p = trunk_pairs[0], trunk_pairs[1]
                enc_grad(w0p, dz)
                b0p[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = None
            elif kind == "skip":
                base = 2 + 3 * sum(
                    1 for j in range(1, i) if j in skips
                ) + 2 * sum(1 for j in range(1, i) if j not in skips)
                wep, whp, bbp = (trunk_pairs[base], trunk_pairs[base + 1],
                                 trunk_pairs[base + 2])
                enc_grad(wep, dz)
                whp[1][:, :] += mm_t(prev, dz)
                bbp[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm_bt(dz, whp[0][:])
            else:
                base = 2 + 3 * sum(
                    1 for j in range(1, i) if j in skips
                ) + 2 * sum(1 for j in range(1, i) if j not in skips)
                wwp, bbp = trunk_pairs[base], trunk_pairs[base + 1]
                wwp[1][:, :] += mm_t(prev, dz)
                bbp[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm_bt(dz, wwp[0][:])

    return kernel


def _make_render_bwd_stash_kernel(n_layers, skips, c_out, compute_dtype,
                                  r_tile, s, n_w):
    """No-recompute backward: trunk activations + hf + dd arrive from the
    forward's stash (at compute_dtype — the exact values the forward's
    matmuls consumed) and the transposed encode from its own stash; only
    the cheap heads (z_sig, feat ≈ 4% of forward FLOPs) and the lane-wise
    compositing are recomputed. Bit-matches the recompute backward."""

    def kernel(z_ref, noise_ref, dir_ref, g_ray_ref, g_w_ref, stash_ref,
               enc_stash_ref, *refs):
        w_refs = refs[:n_w]
        d_refs = refs[n_w:]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in d_refs:
                r[:, :] = jnp.zeros_like(r)

        dt = compute_dtype
        f32 = jnp.float32

        def mm(a_, w_):
            return jnp.dot(a_.astype(dt), w_.astype(dt),
                           preferred_element_type=f32)

        def mm_t(a_, dz):
            return jax.lax.dot_general(
                a_.astype(dt), dz.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        def mm_bt(dz, w_):
            return jax.lax.dot_general(
                dz.astype(dt), w_.astype(dt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )

        pairs = list(zip(w_refs, d_refs))  # _prep_wargs order
        n_trunk_pairs = len(pairs) - 9
        trunk_pairs = pairs[:n_trunk_pairs]
        sw, sb = pairs[n_trunk_pairs], pairs[n_trunk_pairs + 1]
        fw, fb = pairs[n_trunk_pairs + 2], pairs[n_trunk_pairs + 3]
        wd_h, wd_e, bd = (pairs[n_trunk_pairs + 4],
                          pairs[n_trunk_pairs + 5],
                          pairs[n_trunk_pairs + 6])
        fw2, fb2 = pairs[n_trunk_pairs + 7], pairs[n_trunk_pairs + 8]

        # ---- unpack the stash
        w = sw[0].shape[0]  # trunk width
        acts = [
            stash_ref[:, i * w:(i + 1) * w] for i in range(n_layers)
        ]
        hf = stash_ref[:, n_layers * w:(n_layers + 1) * w]
        half = wd_h[0].shape[1]
        dd = stash_ref[:, (n_layers + 1) * w:(n_layers + 1) * w + half]
        enc_t = enc_stash_ref[:, :]

        def enc_grad(pair, dz):
            pair[1][0:enc_t.shape[0], :] += jax.lax.dot_general(
                enc_t.astype(dt), dz.astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        # ---- recompute the cheap heads from the stash (sigma head at
        # compute dtype — see _mlp_fwd; f32 MXU matmuls are ~4-6x slower)
        z_sig = mm(acts[-1], sw[0][:]) + sb[0][:]
        z_feat = mm(dd, fw2[0][:]) + fb2[0][:]
        feat = jax.nn.sigmoid(z_feat)
        sigma = jax.nn.softplus(z_sig[:, :1])

        a, b = _ray_masks(r_tile, s, f32)
        dir_local = dir_ref[:, :]
        z = z_ref[:, :]
        noise = noise_ref[:, :]
        (sigma_rs, deltas, act, alphas, trans, weights,
         w_big) = _composite_fwd_math(sigma, z, noise, a, b, s)

        # ---- composite backward (identical to the recompute kernel)
        g_ray = g_ray_ref[:, :]
        col = jax.lax.broadcasted_iota(jnp.int32, g_ray.shape, 1)
        dfmap = jnp.where(col < c_out, g_ray, 0.0)
        ddepth = jnp.sum(
            jnp.where(col == c_out, g_ray, 0.0), axis=1, keepdims=True
        )
        g_ft = jax.lax.dot_general(
            dfmap.astype(f32), feat.astype(f32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dw_feat = jax.lax.dot_general(
            g_ft * a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dw = g_w_ref[:, :] + ddepth * z + dw_feat
        suffix = _reverse_exclusive_cumsum_lanes(weights * dw)
        one_m = jnp.maximum(1.0 - alphas, 1e-30)
        dalpha = trans * dw - suffix / one_m
        dact = dalpha * deltas * jnp.exp(-deltas * act)
        dsigma_rs = jnp.where(sigma_rs + noise > 0, dact, 0.0)
        dsigma_col = _rs_to_flat(dsigma_rs, a, b)
        dfeat = jax.lax.dot_general(
            w_big, dfmap.astype(f32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        # ---- MLP backward from stashed activations
        dz_feat = dfeat * feat * (1.0 - feat)
        fw2[1][:, :] += mm_t(dd, dz_feat)
        fb2[1][:, :] += jnp.sum(dz_feat, axis=0, keepdims=True)
        ddd = mm_bt(dz_feat, fw2[0][:])
        ddd = jnp.where(dd.astype(f32) > 0, ddd, 0.0)

        wd_h[1][:, :] += mm_t(hf, ddd)
        ddd_ray = jnp.dot(a, ddd, preferred_element_type=f32)
        wd_e[1][:, :] += mm_t(dir_local, ddd_ray)
        bd[1][:, :] += jnp.sum(ddd, axis=0, keepdims=True)
        dhf = mm_bt(ddd, wd_h[0][:])

        fw[1][:, :] += mm_t(acts[-1], dhf)
        fb[1][:, :] += jnp.sum(dhf, axis=0, keepdims=True)
        dh = mm_bt(dhf, fw[0][:])

        dz_sig = dsigma_col * jax.nn.sigmoid(z_sig[:, :1])
        sig_col = jax.lax.broadcasted_iota(jnp.int32, z_sig.shape, 1)
        dz_sig_b = jnp.where(
            sig_col == 0, jnp.broadcast_to(dz_sig, z_sig.shape), 0.0
        )
        sw[1][:, :] += mm_t(acts[-1].astype(f32), dz_sig_b)
        sb[1][:, :] += jnp.sum(dz_sig_b, axis=0, keepdims=True)
        dh = dh + mm_bt(dz_sig_b, sw[0][:])

        for i in range(n_layers - 1, -1, -1):
            dz = jnp.where(acts[i].astype(f32) > 0, dh, 0.0)
            base = 2 + 3 * sum(
                1 for j in range(1, i) if j in skips
            ) + 2 * sum(1 for j in range(1, i) if j not in skips)
            if i == 0:
                w0p, b0p = trunk_pairs[0], trunk_pairs[1]
                enc_grad(w0p, dz)
                b0p[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = None
            elif i in skips:
                wep, whp, bbp = (trunk_pairs[base], trunk_pairs[base + 1],
                                 trunk_pairs[base + 2])
                enc_grad(wep, dz)
                whp[1][:, :] += mm_t(acts[i - 1], dz)
                bbp[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm_bt(dz, whp[0][:])
            else:
                wwp, bbp = trunk_pairs[base], trunk_pairs[base + 1]
                wwp[1][:, :] += mm_t(acts[i - 1], dz)
                bbp[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm_bt(dz, wwp[0][:])

    return kernel


# --------------------------------------------------------------- entry
def _pad_rays(x, n_pad, n):
    return jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x


def _stage_inputs(params, pos, dirs, z_vals, noise, n, s, n_pad,
                  n_emb_xyz, n_emb_dir, compute_dtype, exact_encode,
                  rays_in, skips):
    """Common staging: first kernel operand (od rows or encode stream),
    padded z/noise/dir block, weight operands."""
    if rays_in:
        in0 = _pad_rays(
            jnp.concatenate(
                [pos.astype(jnp.float32), dirs.astype(jnp.float32),
                 jnp.zeros((n, 2), jnp.float32)], -1,
            ),
            n_pad, n,
        )  # (n_pad, 8) = [o | d | pad]
    else:
        in0 = grouped_encode(
            pos.reshape(-1, 3), None, n_emb_xyz, n_emb_dir,
            out_dtype=compute_dtype, exact=exact_encode,
            include_dirs=False,
        )
        in0 = jnp.pad(in0, ((0, (n_pad - n) * s), (0, 0)))
    dir_blk = _pad_rays(
        dir_block_encode(dirs, n_emb_dir, compute_dtype, exact_encode),
        n_pad, n,
    )
    z_p = _pad_rays(z_vals.astype(jnp.float32), n_pad, n)
    no_p = _pad_rays(noise.astype(jnp.float32), n_pad, n)
    wargs = _prep_wargs(params, n_emb_xyz, n_emb_dir, skips,
                        compute_dtype, split_dir=True)
    return in0, z_p, no_p, dir_blk, wargs


def _in0_spec(rays_in, t, enc_cols, r_tile):
    if rays_in:
        return pl.BlockSpec((r_tile, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((t, enc_cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("n_emb_xyz", "n_emb_dir", "r_tile", "compute_dtype",
                     "interpret", "skips", "exact_encode", "rays_in"),
)
def fused_render_apply(
    params: MlpParams,
    pos: jax.Array,        # xyz (N, S, 3), or ray ORIGINS (N, 3) if rays_in
    dirs: jax.Array,       # (N, 3) per-ray
    z_vals: jax.Array,     # (N, S)
    noise: jax.Array,      # (N, S) sigma noise (zeros at eval)
    n_emb_xyz: int = 15,
    n_emb_dir: int = 4,
    r_tile: int = 0,       # rays per grid step; 0 -> 512-point tiles
    compute_dtype=jnp.float32,
    interpret: bool = False,
    skips: Tuple[int, ...] = (4,),
    exact_encode: bool = True,
    rays_in: bool = False,
):
    """-> (ray_block (N, 128) f32 [fmap(:C) | depth(col C)], weights
    (N, S) f32). Matches ``reference_render_apply`` to fp32 tolerance.

    rays_in=True: ``pos`` is per-ray ORIGINS; xyz AND the positional
    encode are computed inside the kernel (no per-point streams at all —
    inputs are o/d/z/noise/dir-block per ray)."""
    n, s = z_vals.shape
    if r_tile <= 0:
        # >= 8 rows (f32 sublane granularity). Forward-only kernels prefer
        # 4096-point tiles (spike_stash_bench split sweep: s=128 fwd r32
        # beats r16; s=64 r64 ~= r32) under the raised _VMEM_LIMIT budget.
        # Power-of-two floor keeps tiles sublane-aligned for every s.
        # CRNERF_FWD_TILE_PTS overrides the points-per-tile target for
        # A/B sweeps (scripts/ab_sweep.sh).
        import os
        pts = int(os.environ.get("CRNERF_FWD_TILE_PTS", 4096))
        r_tile = _pow2_floor(max(8, pts // s))
    t = r_tile * s
    n_pad = _round_up(max(n, r_tile), r_tile)
    c_out = params.feat_w.shape[1]
    c_pad = _round_up(c_out + 1, LANE)

    in0, z_p, no_p, dir_blk, wargs = _stage_inputs(
        params, pos, dirs, z_vals, noise, n, s, n_pad, n_emb_xyz,
        n_emb_dir, compute_dtype, exact_encode, rays_in, skips,
    )
    kernel = _make_render_fwd_kernel(
        len(params.trunk_w), skips, c_out, compute_dtype, r_tile, s,
        n_emb_xyz, rays_in, exact_encode,
    )
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_ray, weights = pl.pallas_call(
        kernel,
        grid=(n_pad // r_tile,),
        in_specs=[
            _in0_spec(rays_in, t, in0.shape[-1], r_tile),
            pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [const(w.shape) for w in wargs],
        out_specs=[
            pl.BlockSpec((r_tile, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((enc_t_rows(n_emb_xyz), t), jnp.float32)
        ],
        interpret=interpret,
        compiler_params=_fwd_compiler_params(),
    )(in0, z_p, no_p, dir_blk, *wargs)
    return out_ray[:n], weights[:n]


@functools.lru_cache(maxsize=32)
def make_fused_render_train(
    n_emb_xyz: int = 15,
    n_emb_dir: int = 4,
    s: int = 128,
    r_tile: int = 0,
    compute_dtype=jnp.float32,
    skips: Tuple[int, ...] = (4,),
    interpret: bool = False,
    exact_encode: bool = True,
    rays_in: bool = False,
    stash: bool = False,
    r_tile_bwd: int = 0,
):
    """Differentiable fused render: forward = the fused MLP+composite
    kernel; backward = one recompute kernel emitting WEIGHT grads only.
    Cotangents arrive for (ray_block, weights); pos/z/noise/dirs get
    zeros. apply_fn(params, pos, dirs, z_vals, noise): ``pos`` is xyz
    (N,S,3), or per-ray ORIGINS (N,3) when rays_in (the kernel then
    computes xyz + the encode itself; residuals are per-ray only).

    stash=True (requires rays_in): the forward additionally writes the
    trunk activations + hf + dd (at compute_dtype) and the transposed
    encode block to HBM, and the backward consumes them instead of
    recomputing the forward — backward FLOPs drop from 3x to ~2.05x
    forward at the cost of ~(L+1.5)*W values/point of HBM traffic, which
    pipelines under the MXU work. HBM lifetime of the stash spans
    forward→backward of ONE pass; pair with gradient-accumulation
    chunking over the grid axis at large G (train/step.py)."""
    if r_tile <= 0:
        # >= 8 rows (f32 sublane granularity). Measured sweet spot on v5e
        # (spike_stash_bench, 8192 rays, split fwd/bwd sweep): the FORWARD
        # prefers 4096-point tiles, the stash BACKWARD 2048-point tiles —
        # s=128 (r_fwd, r_bwd) (32,16)=25.25 ms vs (16,16)=25.60 vs
        # (16,32)=27.63; s=64 (32,32)=12.84 ~= (64,32)=12.85. The bigger
        # blocks need the raised _VMEM_LIMIT budget. Auto tiles are
        # floored to powers of two so any (fwd, bwd) pair divides one
        # another and stays sublane-aligned for EVERY sample count
        # (4096//s is 21 at s=192 — neither).
        import os
        pts = int(os.environ.get("CRNERF_FWD_TILE_PTS", 4096))
        r_tile = _pow2_floor(max(8, pts // s))
    if r_tile_bwd <= 0:
        import os
        pts_b = int(os.environ.get("CRNERF_BWD_TILE_PTS", 2048))
        r_tile_bwd = _pow2_floor(max(8, min(r_tile, pts_b // s)))
    r_big = max(r_tile, r_tile_bwd)
    if r_big % min(r_tile, r_tile_bwd):
        raise ValueError("r_tile and r_tile_bwd must divide one another")
    if stash and not rays_in:
        raise ValueError("stash backward requires the rays-in kernel")
    fwd_kw = dict(n_emb_xyz=n_emb_xyz, n_emb_dir=n_emb_dir, r_tile=r_tile,
                  compute_dtype=compute_dtype, skips=skips,
                  interpret=interpret, exact_encode=exact_encode,
                  rays_in=rays_in)

    @jax.custom_vjp
    def apply_fn(params: MlpParams, pos, dirs, z_vals, noise):
        return fused_render_apply(params, pos, dirs, z_vals, noise,
                                  **fwd_kw)

    def fwd(params, pos, dirs, z_vals, noise):
        n = z_vals.shape[0]
        n_pad = _round_up(max(n, r_big), r_big)
        in0, z_p, no_p, dir_blk, wargs = _stage_inputs(
            params, pos, dirs, z_vals, noise, n, s, n_pad, n_emb_xyz,
            n_emb_dir, compute_dtype, exact_encode, rays_in, skips,
        )
        out, stashes = _call_fwd(params, wargs, in0, z_p, no_p, dir_blk, n)
        return out, (params, in0, z_p, no_p, dir_blk,
                     jnp.zeros((n, 0), pos.dtype),
                     jnp.zeros((dirs.shape[0], 0), dirs.dtype)) + stashes

    def _call_fwd(params, wargs, in0, z_p, no_p, dir_blk, n):
        c_out = params.feat_w.shape[1]
        c_pad = _round_up(c_out + 1, LANE)
        n_pad = z_p.shape[0]
        t = r_tile * s
        n_layers = len(params.trunk_w)
        kernel = _make_render_fwd_kernel(
            n_layers, skips, c_out, compute_dtype, r_tile, s,
            n_emb_xyz, rays_in, exact_encode, stash=stash,
        )
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out_specs = [
            pl.BlockSpec((r_tile, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, s), jnp.float32),
        ]
        if stash:
            n_wargs = len(wargs)
            width = wargs[n_wargs - 9].shape[0]       # sigma weight rows
            half = wargs[n_wargs - 5].shape[1]        # dir-hidden cols
            c_s = _stash_cols(n_layers, width, half)
            e_rows = enc_t_rows(n_emb_xyz)
            out_specs += [
                pl.BlockSpec((t, c_s), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_rows, t), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((n_pad * s, c_s), compute_dtype),
                jax.ShapeDtypeStruct((e_rows, n_pad * s), compute_dtype),
            ]
        res = pl.pallas_call(
            kernel,
            grid=(n_pad // r_tile,),
            in_specs=[
                _in0_spec(rays_in, t, in0.shape[-1], r_tile),
                pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_tile, s), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_tile, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + [const(w.shape) for w in wargs],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((enc_t_rows(n_emb_xyz), t), jnp.float32)
            ],
            interpret=interpret,
            compiler_params=_fwd_compiler_params(),
        )(in0, z_p, no_p, dir_blk, *wargs)
        out_ray, weights = res[0], res[1]
        stashes = tuple(res[2:])
        return (out_ray[:n], weights[:n]), stashes

    def bwd(res, g):
        params, in0, z_p, no_p, dir_blk, x_proxy, d_proxy = res[:7]
        stashes = res[7:]
        g_ray, g_w = g
        n = x_proxy.shape[0]
        n_pad = z_p.shape[0]
        c_out = params.feat_w.shape[1]
        c_pad = _round_up(c_out + 1, LANE)
        rb = r_tile_bwd
        t = rb * s
        g_ray_p = _pad_rays(g_ray.astype(jnp.float32), n_pad, n)
        g_w_p = _pad_rays(g_w.astype(jnp.float32), n_pad, n)

        wargs = _prep_wargs(params, n_emb_xyz, n_emb_dir, skips,
                            compute_dtype, split_dir=True)
        n_w = len(wargs)
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        if stash:
            stash_arr, enc_stash = stashes
            c_s = stash_arr.shape[1]
            e_rows = enc_stash.shape[0]
            kernel = _make_render_bwd_stash_kernel(
                len(params.trunk_w), skips, c_out, compute_dtype,
                rb, s, n_w,
            )
            dwargs = pl.pallas_call(
                kernel,
                grid=(n_pad // rb,),
                in_specs=[
                    pl.BlockSpec((rb, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, LANE), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, c_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, c_s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((e_rows, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ] + [const(w.shape) for w in wargs],
                out_specs=[const(w.shape) for w in wargs],
                out_shape=[
                    jax.ShapeDtypeStruct(w.shape, jnp.float32)
                    for w in wargs
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT),
            )(z_p, no_p, dir_blk, g_ray_p, g_w_p, stash_arr, enc_stash,
              *wargs)
        else:
            kernel = _make_render_bwd_kernel(
                len(params.trunk_w), skips, c_out, compute_dtype, rb,
                s, n_w, n_emb_xyz, rays_in, exact_encode,
            )
            dwargs = pl.pallas_call(
                kernel,
                grid=(n_pad // rb,),
                in_specs=[
                    _in0_spec(rays_in, t, in0.shape[-1], rb),
                    pl.BlockSpec((rb, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, LANE), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, c_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ] + [const(w.shape) for w in wargs],
                out_specs=[const(w.shape) for w in wargs],
                out_shape=[
                    jax.ShapeDtypeStruct(w.shape, jnp.float32)
                    for w in wargs
                ],
                scratch_shapes=[
                    pltpu.VMEM((enc_t_rows(n_emb_xyz), t), jnp.float32)
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT),
            )(in0, z_p, no_p, dir_blk, g_ray_p, g_w_p, *wargs)
        dparams = _ungroup_grads(dwargs, params, n_emb_xyz, n_emb_dir,
                                 skips, split_dir=True)
        dpos = (jnp.zeros((n, 3), x_proxy.dtype) if rays_in
                else jnp.zeros((n, s, 3), x_proxy.dtype))
        return (dparams,
                dpos,
                jnp.zeros((d_proxy.shape[0], 3), d_proxy.dtype),
                jnp.zeros((n, s), jnp.float32),
                jnp.zeros((n, s), jnp.float32))

    apply_fn.defvjp(fwd, bwd)
    return apply_fn
