"""Fused NeRF-MLP evaluation as one Pallas TPU kernel (+ custom-VJP
training backward).

The reference's hot loop is 11 separate torch GEMMs per chunk
(/root/reference/models/nerf.py:137-182 inside rendering.py:110-114); every
intermediate (N, 256) activation round-trips through device memory. Here the
whole trunk+heads chain runs inside ONE kernel per tile of points: weights
(~0.6M params) stay VMEM-resident for the entire grid, activations never
leave VMEM, every matmul hits the MXU with fp32 accumulation.

Design (v3 — exact encode, lane-packed). NOTE: this module is the
FALLBACK path; the production route is ops/fused_render's "rays-in"
kernels, which also fold compositing and the encode itself into the
kernel (Mosaic sin/cos measured bitwise-identical to XLA's — the old
in-kernel-divergence lore traced to inexact jnp.exp2 scale factors, see
fused_render._build_enc_t).
- The positional encoding is computed OUTSIDE the kernel by XLA's exact
  elementwise sin/cos, packed GROUPED into a single 128-lane block per
  point:
  [x(3) | sin_x(3F1) | cos_x(3F1) | d(3) | sin_d(3F2) | cos_d(3F2)]
  = 120 lanes for the CR-NeRF config. One (T, 128) input stream carries
  the entire encode for both branches.
- Every layer that consumed interleaved posenc channels instead consumes
  this block through LANE-ALIGNED, row-permuted weight matrices (zero rows
  kill pad lanes and the foreign branch's lanes). cat-free, gather-free:
  the kernel is matmuls + relu/softplus/sigmoid only.
- Backward (training): a second kernel recomputes the forward from the
  same encode block and accumulates WEIGHT gradients in its output blocks
  across the sequential grid (constant index_map = VMEM-resident
  accumulators). Rays/samples carry no trainable inputs, so no data
  cotangents exist by construction.

``reference_mlp_apply`` is the pure-jnp twin used for equivalence tests.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ANCHOR_SPAN = 8  # exact sin/cos every 8 octaves in the fast-sincos ladder


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class MlpParams(NamedTuple):
    """Dense weights in (in, out) layout, biases (out,).

    trunk_w[0]: (Dxyz, W); trunk_w[i>0]: (W or Dxyz+W, W) — the skip layer
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


def mlp_params_from_flax(flax_params: Dict, depth: int = 8) -> MlpParams:
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


# ------------------------------------------------ grouped lane-packed encode
def _grouped_sincos(v, n_freqs: int, exact: bool = True):
    """(N, D) -> sins (N, D*F), coss (N, D*F) in freq-major-dim-minor order.

    exact=True uses XLA's exact elementwise transcendentals on every
    2^k * v argument. exact=False evaluates exact sin/cos at anchor
    octaves (every ANCHOR_SPAN) and climbs in between with the
    double-angle recurrence (sin 2a = 2 sin a cos a, cos 2a = 1 - 2 sin^2 a)
    — ~SPAN x fewer transcendentals. Recurrence error grows ~2.8x per
    octave from each anchor (measured ~2e-4 max at span 8), well under
    bf16 quantization (4e-3); use only for bf16 compute streams. Requires
    the CR-NeRF logscale frequency ladder 2^0..2^(F-1).
    """
    ss, cs = _grouped_sincos_pieces(v, n_freqs, exact)
    if len(ss) == 1:
        return ss[0], cs[0]
    return jnp.concatenate(ss, -1), jnp.concatenate(cs, -1)


def _grouped_sincos_pieces(v, n_freqs: int, exact: bool = True,
                           out_dtype=None):
    """Like _grouped_sincos but returns per-octave PIECE lists so callers
    can concatenate everything in ONE pass (a stack-then-reshape here made
    XLA write the sin/cos sweep twice — once for the stack, once for the
    final encode concat). exact=True returns single whole-sweep pieces."""
    cast = (lambda x: x) if out_dtype is None else (
        lambda x: x.astype(out_dtype)
    )
    if exact:
        freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
        xb = (v[:, None, :] * jnp.asarray(freqs, v.dtype)[:, None]).reshape(
            v.shape[0], -1
        )  # (N, F*D) args
        return [cast(jnp.sin(xb))], [cast(jnp.cos(xb))]
    span = ANCHOR_SPAN
    ss, cs = [], []
    for a in range(0, n_freqs, span):
        va = v * (2.0 ** a)
        s, c = jnp.sin(va), jnp.cos(va)
        ss.append(cast(s))
        cs.append(cast(c))
        for _ in range(min(span, n_freqs - a) - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            ss.append(cast(s))
            cs.append(cast(c))
    return ss, cs


def grouped_encode(xyz, dirs, n_emb_xyz: int, n_emb_dir: int, *,
                   dir_rep: int = 1, out_dtype=jnp.float32,
                   exact: bool = True, include_dirs: bool = True):
    """-> (N, enc_cols) lane-packed grouped encode in ``out_dtype``. One
    concat builds the padded block directly (single fused materialization).

    ``dir_rep`` R > 1: ``dirs`` is (N/R, 3) PER-RAY directions, each
    logically repeated R times (rays-major) — the dir sin/cos sweep runs
    once per ray instead of once per sample point.

    ``include_dirs=False``: xyz-only block (93 lanes -> same 128-lane
    pad); the dir encode then travels separately per ray
    (``dir_block_encode``, split-dir kernels).
    """
    n = xyz.shape[0]
    if not include_dirs:
        sxs, cxs = _grouped_sincos_pieces(
            xyz.astype(jnp.float32), n_emb_xyz, exact, out_dtype
        )
        sx = sxs[0] if len(sxs) == 1 else (
            jnp.stack(sxs, axis=1).reshape(n, -1)
        )
        cx = cxs[0] if len(cxs) == 1 else (
            jnp.stack(cxs, axis=1).reshape(n, -1)
        )
        parts = [xyz.astype(out_dtype), sx, cx]
        total = sum(p.shape[-1] for p in parts)
        cols = _round_up(total, LANE)
        if cols != total:
            parts.append(jnp.zeros((n, cols - total), out_dtype))
        return jnp.concatenate(parts, axis=-1)
    # octave pieces are cast to out_dtype BEFORE the per-sweep stack, so
    # the f32 recurrence + convert fuse into one write per sweep. (Do NOT
    # concat the (N,3) pieces directly into the block: 3-lane arrays
    # materialize as full 128-lane tiles — a 42x HBM padding blowup.)

    def sweep(v, n_freqs):
        ss, cs = _grouped_sincos_pieces(
            v.astype(jnp.float32), n_freqs, exact, out_dtype
        )
        if len(ss) == 1:
            return ss[0], cs[0]
        m = v.shape[0]
        return (jnp.stack(ss, axis=1).reshape(m, -1),
                jnp.stack(cs, axis=1).reshape(m, -1))

    sx, cx = sweep(xyz, n_emb_xyz)
    sd, cd = sweep(dirs, n_emb_dir)

    def rep(a):
        if dir_rep == 1:
            return a
        return jnp.broadcast_to(
            a[:, None, :], (a.shape[0], dir_rep, a.shape[-1])
        ).reshape(n, a.shape[-1])

    parts = [xyz.astype(out_dtype), sx, cx,
             rep(dirs.astype(out_dtype)), rep(sd), rep(cd)]
    total = sum(p.shape[-1] for p in parts)
    cols = _round_up(total, LANE)
    if cols != total:
        parts.append(jnp.zeros((n, cols - total), out_dtype))
    return jnp.concatenate(parts, axis=-1)


def _lane_offsets(n_emb_xyz: int, n_emb_dir: int):
    """Start lanes of [x, sin_x, cos_x, d, sin_d, cos_d] in the packed
    block."""
    f1, f2 = 3 * n_emb_xyz, 3 * n_emb_dir
    ox = 0
    osx = 3
    ocx = 3 + f1
    od = 3 + 2 * f1
    osd = od + 3
    ocd = osd + f2
    total = ocd + f2
    return (ox, osx, ocx, od, osd, ocd), total


def _interleaved_to_group_perm(n_freqs: int):
    """For an interleaved (3 + 6F)-row weight block, the source row index
    feeding each grouped position [x(3), sins(3F), coss(3F)]."""
    D = 3
    rows = list(range(D))
    rows += [D + 2 * D * f + d for f in range(n_freqs) for d in range(D)]
    rows += [D + 2 * D * f + D + d for f in range(n_freqs) for d in range(D)]
    return rows


def _enc_weight(w_int, which: str, n_emb_xyz: int, n_emb_dir: int,
                out_cols: int):
    """Interleaved-layout weight rows -> enc-lane-aligned (enc_cols, out)
    matrix. ``which``: 'xyz' places rows in the x/sin_x/cos_x lanes,
    'dir' in the d/sin_d/cos_d lanes; all other lanes get zero rows."""
    (ox, osx, ocx, od, osd, ocd), total = _lane_offsets(
        n_emb_xyz, n_emb_dir
    )
    enc_cols = _round_up(total, LANE)
    mat = jnp.zeros((enc_cols, out_cols), w_int.dtype)
    if which == "xyz":
        perm = _interleaved_to_group_perm(n_emb_xyz)
        lanes = (
            list(range(ox, ox + 3))
            + list(range(osx, osx + 3 * n_emb_xyz))
            + list(range(ocx, ocx + 3 * n_emb_xyz))
        )
    else:
        perm = _interleaved_to_group_perm(n_emb_dir)
        lanes = (
            list(range(od, od + 3))
            + list(range(osd, osd + 3 * n_emb_dir))
            + list(range(ocd, ocd + 3 * n_emb_dir))
        )
    src = w_int[np.asarray(perm)]
    mat = mat.at[np.asarray(lanes), : src.shape[1]].set(src)
    return mat


def _enc_grad_extract(g_enc, which: str, n_emb_xyz: int, n_emb_dir: int,
                      out_cols: int):
    """Inverse of _enc_weight for gradients: (enc_cols, out_pad) ->
    interleaved (3+6F, out_cols)."""
    (ox, osx, ocx, od, osd, ocd), _ = _lane_offsets(n_emb_xyz, n_emb_dir)
    if which == "xyz":
        F = n_emb_xyz
        lanes = (
            list(range(ox, ox + 3))
            + list(range(osx, osx + 3 * F))
            + list(range(ocx, ocx + 3 * F))
        )
        perm = _interleaved_to_group_perm(F)
    else:
        F = n_emb_dir
        lanes = (
            list(range(od, od + 3))
            + list(range(osd, osd + 3 * F))
            + list(range(ocd, ocd + 3 * F))
        )
        perm = _interleaved_to_group_perm(F)
    grouped = g_enc[np.asarray(lanes), :out_cols]  # (3+6F, out) grouped
    out = jnp.zeros_like(grouped)
    out = out.at[np.asarray(perm)].set(grouped)
    return out


def _pad2(w, rows, cols):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


def dir_block_encode(dirs, n_emb_dir: int, out_dtype=jnp.float32,
                     exact: bool = True):
    """Per-RAY dir encode as its own (N_rays, LANE) lane block:
    [d(3) | sin_d(3F) | cos_d(3F) | zeros]. Consumed by the split-dir
    fused render kernel, which spreads the per-ray dir contribution to
    sample points in-VMEM instead of materializing repeated dir lanes in
    the big per-point encode stream."""
    sds, cds = _grouped_sincos_pieces(
        dirs.astype(jnp.float32), n_emb_dir, exact, out_dtype
    )
    n = dirs.shape[0]
    sd = sds[0] if len(sds) == 1 else jnp.stack(sds, 1).reshape(n, -1)
    cd = cds[0] if len(cds) == 1 else jnp.stack(cds, 1).reshape(n, -1)
    parts = [dirs.astype(out_dtype), sd, cd]
    total = sum(p.shape[-1] for p in parts)
    parts.append(jnp.zeros((n, LANE - total), out_dtype))
    return jnp.concatenate(parts, axis=-1)


def _dir_block_weight(w_int, n_emb_dir: int, out_cols: int):
    """Interleaved (3+6F, out) dir-branch weight rows -> a (LANE, out)
    matrix aligned to the dir_block_encode lane layout."""
    perm = _interleaved_to_group_perm(n_emb_dir)
    src = w_int[np.asarray(perm)]
    mat = jnp.zeros((LANE, out_cols), w_int.dtype)
    mat = mat.at[: src.shape[0], : src.shape[1]].set(src)
    return mat


def _dir_block_grad_extract(g, n_emb_dir: int, out_cols: int):
    """Inverse of _dir_block_weight for gradients: (LANE, out_pad) ->
    interleaved (3+6F, out_cols)."""
    rows = 3 + 6 * n_emb_dir
    grouped = g[:rows, :out_cols]
    out = jnp.zeros_like(grouped)
    out = out.at[
        np.asarray(_interleaved_to_group_perm(n_emb_dir))
    ].set(grouped)
    return out


# ----------------------------------------------------- weight preparation
def _prep_wargs(params: MlpParams, n_emb_xyz: int, n_emb_dir: int,
                skips: Tuple[int, ...], compute_dtype,
                split_dir: bool = False):
    """Kernel weight operands, in consumption order. Layers touching the
    encode get ONE (enc_cols, out) lane-aligned matrix.

    split_dir=True: the dir-branch encode weight is laid out for the
    per-RAY dir block (dir_block_encode) instead of the per-point encode
    stream. (The xyz lane offsets are identical either way — dirs sit
    after xyz in the joint block, so trunk/skip matrices are unchanged.)
    """
    d_xyz = 3 * (1 + 2 * n_emb_xyz)
    width = params.final_w.shape[0]
    w_pad = _round_up(width, LANE)
    half = params.dir_w.shape[1]
    half_pad = _round_up(half, LANE)
    c_out = params.feat_w.shape[1]
    c_pad = _round_up(c_out + 1, LANE)

    wargs = []
    wargs.append(
        _enc_weight(params.trunk_w[0], "xyz", n_emb_xyz, n_emb_dir, w_pad)
    )
    wargs.append(_pad2(params.trunk_b[0].reshape(1, -1), 1, w_pad))
    for i in range(1, len(params.trunk_w)):
        w = params.trunk_w[i]
        if i in skips:
            wargs.append(
                _enc_weight(w[:d_xyz], "xyz", n_emb_xyz, n_emb_dir, w_pad)
            )
            wargs.append(_pad2(w[d_xyz:], w_pad, w_pad))
        else:
            wargs.append(_pad2(w, w_pad, w_pad))
        wargs.append(_pad2(params.trunk_b[i].reshape(1, -1), 1, w_pad))
    wargs.append(_pad2(params.sigma_w, w_pad, LANE))
    wargs.append(_pad2(params.sigma_b.reshape(1, -1), 1, LANE))
    wargs.append(_pad2(params.final_w, w_pad, w_pad))
    wargs.append(_pad2(params.final_b.reshape(1, -1), 1, w_pad))
    wargs.append(_pad2(params.dir_w[:width], w_pad, half_pad))
    if split_dir:
        wargs.append(
            _dir_block_weight(params.dir_w[width:], n_emb_dir, half_pad)
        )
    else:
        wargs.append(
            _enc_weight(params.dir_w[width:], "dir", n_emb_xyz, n_emb_dir,
                        half_pad)
        )
    wargs.append(_pad2(params.dir_b.reshape(1, -1), 1, half_pad))
    wargs.append(_pad2(params.feat_w, half_pad, c_pad))
    wargs.append(_pad2(params.feat_b.reshape(1, -1), 1, c_pad))

    if compute_dtype != jnp.float32:
        sigma_w_idx = len(wargs) - 9  # [...sigma_w, sigma_b, final_w,
        # final_b, dir_h, dir_enc, dir_b, feat_w, feat_b]
        wargs = [
            w if (w.shape[0] == 1 or i == sigma_w_idx)
            else w.astype(compute_dtype)
            for i, w in enumerate(wargs)
        ]
    return wargs


# --------------------------------------------------------------- kernels
def _make_fwd_kernel(n_layers: int, skips: Tuple[int, ...], c_out: int,
                     compute_dtype):
    def kernel(enc_ref, *refs):
        out_ref = refs[-1]
        widx = 0

        def nxt():
            nonlocal widx
            r = refs[widx]
            widx += 1
            return r

        dt = compute_dtype
        f32 = jnp.float32

        def mm(a, w):
            return jnp.dot(a.astype(dt), w[:].astype(dt),
                           preferred_element_type=f32)

        enc = enc_ref[:, :]
        w0 = nxt()
        b0 = nxt()
        h = mm(enc, w0) + b0[:]
        h = jnp.maximum(h, 0.0).astype(dt)
        for i in range(1, n_layers):
            if i in skips:
                we, wh = nxt(), nxt()
                b = nxt()
                h = mm(enc, we) + mm(h, wh) + b[:]
            else:
                w = nxt()
                b = nxt()
                h = mm(h, w) + b[:]
            h = jnp.maximum(h, 0.0).astype(dt)

        sw = nxt()
        sb = nxt()
        sigma = jnp.dot(h.astype(f32), sw[:].astype(f32),
                        preferred_element_type=f32) + sb[:]
        sigma = jax.nn.softplus(sigma)

        fw = nxt()
        fb = nxt()
        hf = (mm(h, fw) + fb[:]).astype(dt)

        wd_h, wd_e = nxt(), nxt()
        bd = nxt()
        dd = mm(hf, wd_h) + mm(enc, wd_e) + bd[:]
        dd = jnp.maximum(dd, 0.0).astype(dt)

        fw2 = nxt()
        fb2 = nxt()
        feat = jax.nn.sigmoid(mm(dd, fw2) + fb2[:])

        col = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
        sig_b = jnp.broadcast_to(sigma[:, :1], feat.shape)
        out_ref[:, :] = jnp.where(
            col < c_out, feat, jnp.where(col == c_out, sig_b, 0.0)
        )

    return kernel


def _make_bwd_kernel(n_layers: int, skips: Tuple[int, ...], c_out: int,
                     compute_dtype, n_w: int):
    """Recompute forward from the encode block, backprop, accumulate
    weight grads in the (constant-index) output blocks."""

    def kernel(enc_ref, g_ref, *refs):
        w_refs = refs[:n_w]
        d_refs = refs[n_w:]

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

        def mm(a, w):
            return jnp.dot(a.astype(dt), w.astype(dt),
                           preferred_element_type=f32)

        def mm_t(a, dz):
            return jax.lax.dot_general(
                a.astype(dt), dz.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        def mm_bt(dz, w):
            return jax.lax.dot_general(
                dz.astype(dt), w.astype(dt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )

        enc = enc_ref[:, :]
        layers = []
        acts = []
        w0 = nxt()
        b0 = nxt()
        h = mm(enc, w0[0][:]) + b0[0][:]
        h = jnp.maximum(h, 0.0).astype(dt)
        layers.append(("enc", (w0, b0), None))
        acts.append(h)
        for i in range(1, n_layers):
            if i in skips:
                we, wh, bb = nxt(), nxt(), nxt()
                h_new = (mm(enc, we[0][:]) + mm(h, wh[0][:]) + bb[0][:])
                layers.append(("skip", (we, wh, bb), h))
            else:
                ww, bb = nxt(), nxt()
                h_new = mm(h, ww[0][:]) + bb[0][:]
                layers.append(("dense", (ww, bb), h))
            h = jnp.maximum(h_new, 0.0).astype(dt)
            acts.append(h)

        sw = nxt()
        sb = nxt()
        z_sig = jnp.dot(h.astype(f32), sw[0][:].astype(f32),
                        preferred_element_type=f32) + sb[0][:]
        fw = nxt()
        fb = nxt()
        hf = (mm(h, fw[0][:]) + fb[0][:]).astype(dt)
        wd_h, wd_e, bd = nxt(), nxt(), nxt()
        zd = mm(hf, wd_h[0][:]) + mm(enc, wd_e[0][:]) + bd[0][:]
        dd = jnp.maximum(zd, 0.0).astype(dt)
        fw2 = nxt()
        fb2 = nxt()
        z_feat = mm(dd, fw2[0][:]) + fb2[0][:]
        feat = jax.nn.sigmoid(z_feat)

        # ---- backward
        g = g_ref[:, :]
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        dfeat = jnp.where(col < c_out, g, 0.0)
        dsigma = jnp.sum(
            jnp.where(col == c_out, g, 0.0), axis=1, keepdims=True
        )

        dz_feat = dfeat * feat * (1.0 - feat)
        fw2[1][:, :] += mm_t(dd, dz_feat)
        fb2[1][:, :] += jnp.sum(dz_feat, axis=0, keepdims=True)
        ddd = mm_bt(dz_feat, fw2[0][:])
        ddd = jnp.where(dd.astype(f32) > 0, ddd, 0.0)

        wd_h[1][:, :] += mm_t(hf, ddd)
        wd_e[1][:, :] += mm_t(enc, ddd)
        bd[1][:, :] += jnp.sum(ddd, axis=0, keepdims=True)
        dhf = mm_bt(ddd, wd_h[0][:])

        fw[1][:, :] += mm_t(acts[-1], dhf)
        fb[1][:, :] += jnp.sum(dhf, axis=0, keepdims=True)
        dh = mm_bt(dhf, fw[0][:])

        dz_sig = dsigma * jax.nn.sigmoid(z_sig[:, :1])
        sig_col = jax.lax.broadcasted_iota(jnp.int32, z_sig.shape, 1)
        dz_sig_b = jnp.where(
            sig_col == 0, jnp.broadcast_to(dz_sig, z_sig.shape), 0.0
        )
        sw[1][:, :] += mm_t(acts[-1].astype(f32), dz_sig_b)
        sb[1][:, :] += jnp.sum(dz_sig_b, axis=0, keepdims=True)
        dh = dh + jax.lax.dot_general(
            dz_sig_b, sw[0][:].astype(f32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

        for i in range(n_layers - 1, -1, -1):
            # fp32 compare: bf16 comparisons don't lower on this target
            dz = jnp.where(acts[i].astype(f32) > 0, dh, 0.0)
            kind, ws, prev = layers[i]
            if kind == "enc":
                w0, b0 = ws
                w0[1][:, :] += mm_t(enc, dz)
                b0[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = None
            elif kind == "skip":
                we, wh, bb = ws
                we[1][:, :] += mm_t(enc, dz)
                wh[1][:, :] += mm_t(prev, dz)
                bb[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm_bt(dz, wh[0][:])
            else:
                ww, bb = ws
                ww[1][:, :] += mm_t(prev, dz)
                bb[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm_bt(dz, ww[0][:])

    return kernel


# -------------------------------------------------------------- entry pts
def _apply_from_enc(params, enc_padded, n, c_out, tile, compute_dtype,
                    skips, interpret, n_emb_xyz, n_emb_dir,
                    packed: bool = False):
    """Run the forward kernel on an already-padded encode block.

    packed=True returns the raw (n, c_pad) kernel output — [features,
    sigma at col c_out, zeros] — skipping the minor-dim slice to c_out+1
    columns (an ~800 MB relayout copy per pass at CR-NeRF train shapes;
    consumers slice small downstream results instead)."""
    c_pad = _round_up(c_out + 1, LANE)
    n_pad = enc_padded.shape[0]
    enc_cols = enc_padded.shape[-1]
    wargs = _prep_wargs(params, n_emb_xyz, n_emb_dir, skips, compute_dtype)
    kernel = _make_fwd_kernel(
        len(params.trunk_w), skips, c_out, compute_dtype
    )
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, enc_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [const(w.shape) for w in wargs],
        out_specs=pl.BlockSpec(
            (tile, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(enc_padded, *wargs)
    if packed:
        return out[:n]
    return out[:n, : c_out + 1]


@functools.partial(
    jax.jit,
    static_argnames=("n_emb_xyz", "n_emb_dir", "tile", "compute_dtype",
                     "interpret", "skips", "dir_rep", "exact_encode",
                     "packed"),
)
def fused_mlp_apply(
    params: MlpParams,
    xyz: jax.Array,            # (N, 3)
    dirs: jax.Array,           # (N, 3), or (N/dir_rep, 3) per-RAY dirs
    n_emb_xyz: int = 15,
    n_emb_dir: int = 4,
    tile: int = 1024,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    skips: Tuple[int, ...] = (4,),
    dir_rep: int = 1,
    exact_encode: bool = True,
    packed: bool = False,
) -> jax.Array:
    """-> (N, C+1) = [sigmoid features, softplus sigma]; matches
    ``reference_mlp_apply`` to fp32 tolerance (the encode itself is
    computed by XLA outside the kernel). packed=True returns the raw
    (N, c_pad) lane block instead (features ..., sigma at col C, zeros)."""
    n = xyz.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    # encode built directly in the kernel's compute dtype: identical to
    # the kernel's internal cast, half the HBM traffic when bf16
    enc = grouped_encode(
        xyz, dirs, n_emb_xyz, n_emb_dir, dir_rep=dir_rep,
        out_dtype=compute_dtype, exact=exact_encode,
    )
    if n_pad != n:
        enc = jnp.pad(enc, ((0, n_pad - n), (0, 0)))
    return _apply_from_enc(
        params, enc, n, params.feat_w.shape[1], tile, compute_dtype,
        skips, interpret, n_emb_xyz, n_emb_dir, packed=packed,
    )


def _ungroup_grads(dwargs, params: MlpParams, n_emb_xyz: int,
                   n_emb_dir: int, skips: Tuple[int, ...],
                   split_dir: bool = False) -> MlpParams:
    """Lane-aligned/padded weight grads -> MlpParams-shaped cotangent.
    split_dir must mirror the _prep_wargs flag (dir weight layout)."""
    width = params.final_w.shape[0]
    half = params.dir_w.shape[1]
    c_out = params.feat_w.shape[1]
    it = iter(dwargs)

    tw, tb = [], []
    g0, gb0 = next(it), next(it)
    tw.append(_enc_grad_extract(g0, "xyz", n_emb_xyz, n_emb_dir, width))
    tb.append(gb0[0, :width])
    for i in range(1, len(params.trunk_w)):
        if i in skips:
            ge, gh, gb = next(it), next(it), next(it)
            top = _enc_grad_extract(ge, "xyz", n_emb_xyz, n_emb_dir, width)
            tw.append(jnp.concatenate([top, gh[:width, :width]], axis=0))
        else:
            gw, gb = next(it), next(it)
            tw.append(gw[:width, :width])
        tb.append(gb[0, :width])
    gsw, gsb = next(it), next(it)
    gfw, gfb = next(it), next(it)
    gdh, gde, gdb = next(it), next(it), next(it)
    gf2w, gf2b = next(it), next(it)
    return MlpParams(
        trunk_w=tuple(tw),
        trunk_b=tuple(tb),
        sigma_w=gsw[:width, :1],
        sigma_b=gsb[0, :1],
        final_w=gfw[:width, :width],
        final_b=gfb[0, :width],
        dir_w=jnp.concatenate(
            [gdh[:width, :half],
             _dir_block_grad_extract(gde, n_emb_dir, half) if split_dir
             else _enc_grad_extract(gde, "dir", n_emb_xyz, n_emb_dir,
                                    half)],
            axis=0,
        ),
        dir_b=gdb[0, :half],
        feat_w=gf2w[:half, :c_out],
        feat_b=gf2b[0, :c_out],
    )


@functools.lru_cache(maxsize=32)
def make_fused_mlp_train(
    n_emb_xyz: int = 15,
    n_emb_dir: int = 4,
    tile: int = 512,
    compute_dtype=jnp.float32,
    skips: Tuple[int, ...] = (4,),
    interpret: bool = False,
    dir_rep: int = 1,
    exact_encode: bool = True,
    packed: bool = False,
):
    """Differentiable fused-MLP apply: forward = the Pallas kernel;
    backward = a second Pallas kernel producing WEIGHT gradients only
    (rays/samples carry no trainable inputs). Activations never touch HBM
    in either pass. packed=True: in/out cotangent in raw (N, c_pad) lane
    layout (no minor-dim slice/pad round-trips)."""

    fwd_kw = dict(n_emb_xyz=n_emb_xyz, n_emb_dir=n_emb_dir, tile=tile,
                  compute_dtype=compute_dtype, skips=skips,
                  interpret=interpret, dir_rep=dir_rep,
                  exact_encode=exact_encode, packed=packed)

    @jax.custom_vjp
    def apply_fn(params: MlpParams, xyz, dirs):
        return fused_mlp_apply(params, xyz, dirs, **fwd_kw)

    def fwd(params, xyz, dirs):
        # compute the encode ONCE; fwd kernel consumes it and it rides the
        # residuals into bwd (the sin/cos sweep is ~half the non-MLP step
        # cost — recomputing it in bwd showed up as 2x multiply_cosine
        # fusions in profiles)
        n = xyz.shape[0]
        n_pad = _round_up(max(n, tile), tile)
        enc = grouped_encode(
            xyz, dirs, n_emb_xyz, n_emb_dir, dir_rep=dir_rep,
            out_dtype=compute_dtype, exact=exact_encode,
        )
        if n_pad != n:
            enc = jnp.pad(enc, ((0, n_pad - n), (0, 0)))
        out = _apply_from_enc(
            params, enc, n, params.feat_w.shape[1], tile, compute_dtype,
            skips, interpret, n_emb_xyz, n_emb_dir, packed=packed,
        )
        # zero-width carriers keep xyz/dirs shape+dtype in the residuals
        # (dtype objects are not valid residual leaves)
        return out, (params, enc, jnp.zeros((n, 0), xyz.dtype),
                     jnp.zeros((dirs.shape[0], 0), dirs.dtype))

    def bwd(res, g):
        params, enc, x_proxy, d_proxy = res
        n = x_proxy.shape[0]
        c_out = params.feat_w.shape[1]
        c_pad = _round_up(c_out + 1, LANE)
        n_pad = enc.shape[0]
        enc_cols = enc.shape[-1]
        if packed:
            # cotangent arrives in the kernel's lane layout; the bwd
            # kernel masks with col < c_out / col == c_out, so junk-lane
            # cotangents are ignored by construction
            g_p = g.astype(jnp.float32)
            if n_pad != n:
                g_p = jnp.pad(g_p, ((0, n_pad - n), (0, 0)))
        else:
            g_p = jnp.zeros((n_pad, c_pad), jnp.float32)
            g_p = g_p.at[:n, : c_out + 1].set(g.astype(jnp.float32))

        wargs = _prep_wargs(params, n_emb_xyz, n_emb_dir, skips,
                            compute_dtype)
        n_w = len(wargs)
        kernel = _make_bwd_kernel(
            len(params.trunk_w), skips, c_out, compute_dtype, n_w
        )
        grid = (n_pad // tile,)
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        dwargs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, enc_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, c_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + [const(w.shape) for w in wargs],
            out_specs=[const(w.shape) for w in wargs],
            out_shape=[
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wargs
            ],
            interpret=interpret,
        )(enc, g_p, *wargs)
        dparams = _ungroup_grads(dwargs, params, n_emb_xyz, n_emb_dir,
                                 skips)
        return (dparams, jnp.zeros((n, 3), x_proxy.dtype),
                jnp.zeros((d_proxy.shape[0], 3), d_proxy.dtype))

    apply_fn.defvjp(fwd, bwd)
    return apply_fn
