"""Fused positional-encoding + NeRF-MLP evaluation as one Pallas TPU kernel.

The reference's hot loop is 11 separate torch GEMMs per chunk
(/root/reference/models/nerf.py:137-182 inside rendering.py:110-114); every
intermediate (N, 256) activation round-trips through device memory. Here the
whole chain — frequency encoding, 8x256 trunk with the skip at layer 4, the
sigma head, and the direction branch down to the 64-dim cross-ray feature —
runs inside ONE kernel per tile of points: weights (~0.6M params) live in
VMEM for the entire grid, activations never leave VMEM, and every matmul
hits the MXU with fp32 accumulation.

Kernel design (v2 — matmul-only dataflow):
- The interleaved posenc ``[x, sin(f0)x, cos(f0)x, ...]`` is NOT built in
  the kernel (narrow 3-lane concats are poison for the VPU). Instead the
  encode is ``sins = sin(x @ E)``, ``coss = cos(x @ E)`` with a trace-time
  (3, F*3) frequency matrix E, and every layer that consumed the interleaved
  encoding instead consumes the grouped blocks ``[x | sins | coss]`` through
  ROW-PERMUTED weight slices: cat-layout @ W == x @ W_x + sins @ W_s +
  coss @ W_c. Zero-padded columns are killed by zero weight rows (including
  the cos(0)=1 pad lanes).
- The skip layer and dir branch use the same sliced-matmul trick, so the
  kernel contains no concatenates at all — only MXU matmuls, sin/cos, relu,
  softplus, sigmoid.

``reference_mlp_apply`` is the pure-jnp twin used for equivalence tests and
as the CPU fallback.
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


# -------------------------------------------------- layout transformations
def _group_rows(n_freqs: int):
    """Interleaved posenc row indices -> (x_rows, sin_rows, cos_rows)."""
    D = 3
    x_rows = list(range(D))
    sin_rows = [D + 2 * D * f + d for f in range(n_freqs) for d in range(D)]
    cos_rows = [
        D + 2 * D * f + D + d for f in range(n_freqs) for d in range(D)
    ]
    return x_rows, sin_rows, cos_rows


def _freq_matrix(n_freqs: int) -> np.ndarray:
    """(3, F*3) E with sin/cos args: (x @ E)[:, f*3+d] = x_d * 2^f."""
    freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    E = np.zeros((3, n_freqs * 3), np.float32)
    for f in range(n_freqs):
        for d in range(3):
            E[d, f * 3 + d] = freqs[f]
    return E


def _pad2(w, rows, cols):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


def _pad_rows_sel(w, rows_sel, rows_pad, cols_pad):
    """Select rows rows_sel from w, zero-pad to (rows_pad, cols_pad)."""
    sel = w[np.asarray(rows_sel)]
    return _pad2(sel, rows_pad, cols_pad)


# --------------------------------------------------------------- the kernel
def _make_kernel(n_layers: int, skips: Tuple[int, ...], c_out: int,
                 compute_dtype, s_xyz_cols: int, s_dir_cols: int):
    def kernel(xyz_ref, dir_ref, exyz_ref, edir_ref, *refs):
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

        xpad = xyz_ref[:, :]                       # (T, 128), cols 3+ zero
        args = jnp.dot(xpad, exyz_ref[:, :],
                       preferred_element_type=f32)  # (T, Sx)
        sins = jnp.sin(args)
        coss = jnp.cos(args)                        # pad lanes: cos(0)=1,
        #                                 killed by zero rows in W_c slices

        dpad = dir_ref[:, :]
        dargs = jnp.dot(dpad, edir_ref[:, :], preferred_element_type=f32)
        dsin = jnp.sin(dargs)
        dcos = jnp.cos(dargs)

        # layer 0: grouped-encode consumption
        w_x, w_s, w_c = nxt(), nxt(), nxt()
        b = nxt()
        h = mm(xpad, w_x) + mm(sins, w_s) + mm(coss, w_c) + b[:]
        h = jnp.maximum(h, 0.0).astype(dt)

        for i in range(1, n_layers):
            if i in skips:
                w_x, w_s, w_c, w_h = nxt(), nxt(), nxt(), nxt()
                b = nxt()
                h = (
                    mm(xpad, w_x) + mm(sins, w_s) + mm(coss, w_c)
                    + mm(h, w_h) + b[:]
                )
            else:
                w = nxt()
                b = nxt()
                h = mm(h, w) + b[:]
            h = jnp.maximum(h, 0.0).astype(dt)

        sigma_w = nxt()
        sigma_b = nxt()
        sigma = jnp.dot(h.astype(f32), sigma_w[:].astype(f32),
                        preferred_element_type=f32) + sigma_b[:]
        sigma = jax.nn.softplus(sigma)

        final_w = nxt()
        final_b = nxt()
        hf = (mm(h, final_w) + final_b[:]).astype(dt)

        # dir layer: cat([hf, dir-encode]) via grouped slices
        wd_h, wd_x, wd_s, wd_c = nxt(), nxt(), nxt(), nxt()
        bd = nxt()
        dd = (
            mm(hf, wd_h) + mm(dpad, wd_x) + mm(dsin, wd_s)
            + mm(dcos, wd_c) + bd[:]
        )
        dd = jnp.maximum(dd, 0.0).astype(dt)

        feat_w = nxt()
        feat_b = nxt()
        feat = mm(dd, feat_w) + feat_b[:]
        feat = jax.nn.sigmoid(feat)

        # assemble [feat | sigma] with lane masks (scatter doesn't lower
        # on Mosaic); feat already has out_ref's padded width
        col = jax.lax.broadcasted_iota(jnp.int32, feat.shape, 1)
        sig_b = jnp.broadcast_to(sigma[:, :1], feat.shape)
        out_ref[:, :] = jnp.where(
            col < c_out, feat, jnp.where(col == c_out, sig_b, 0.0)
        )

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
    tile: int = 1024,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    skips: Tuple[int, ...] = (4,),
) -> jax.Array:
    """-> (N, C+1) = [sigmoid features, softplus sigma]; matches
    ``reference_mlp_apply`` to fp32 tolerance."""
    n = xyz.shape[0]
    c_out = params.feat_w.shape[1]
    d_xyz = 3 * (1 + 2 * n_emb_xyz)
    width = params.final_w.shape[0]
    w_pad = _round_up(width, LANE)
    half = params.dir_w.shape[1]
    half_pad = _round_up(half, LANE)
    c_pad = _round_up(c_out + 1, LANE)

    s_xyz = 3 * n_emb_xyz                  # 45 sin (and cos) columns
    s_dir = 3 * n_emb_dir
    s_xyz_pad = _round_up(s_xyz, LANE)
    s_dir_pad = _round_up(s_dir, LANE)

    n_pad = _round_up(max(n, tile), tile)
    xyz_p = jnp.pad(
        xyz.astype(jnp.float32), ((0, n_pad - n), (0, LANE - 3))
    )
    dirs_p = jnp.pad(
        dirs.astype(jnp.float32), ((0, n_pad - n), (0, LANE - 3))
    )

    e_xyz = _pad2(jnp.asarray(_freq_matrix(n_emb_xyz)), LANE, s_xyz_pad)
    e_dir = _pad2(jnp.asarray(_freq_matrix(n_emb_dir)), LANE, s_dir_pad)

    xr, sr, cr = _group_rows(n_emb_xyz)
    dxr, dsr, dcr = _group_rows(n_emb_dir)

    wargs = []

    def add_grouped(w, cols):
        wargs.append(_pad_rows_sel(w, xr, LANE, cols))
        wargs.append(_pad_rows_sel(w, sr, s_xyz_pad, cols))
        wargs.append(_pad_rows_sel(w, cr, s_xyz_pad, cols))

    # layer 0
    add_grouped(params.trunk_w[0], w_pad)
    wargs.append(_pad2(params.trunk_b[0].reshape(1, -1), 1, w_pad))
    for i in range(1, len(params.trunk_w)):
        w = params.trunk_w[i]
        if i in skips:
            # rows [0:d_xyz] = interleaved x-encode part; rows [d_xyz:] = h
            add_grouped(w[:d_xyz], w_pad)
            wargs.append(_pad2(w[d_xyz:], w_pad, w_pad))
        else:
            wargs.append(_pad2(w, w_pad, w_pad))
        wargs.append(_pad2(params.trunk_b[i].reshape(1, -1), 1, w_pad))

    wargs.append(_pad2(params.sigma_w, w_pad, LANE))
    wargs.append(_pad2(params.sigma_b.reshape(1, -1), 1, LANE))
    wargs.append(_pad2(params.final_w, w_pad, w_pad))
    wargs.append(_pad2(params.final_b.reshape(1, -1), 1, w_pad))

    # dir layer rows: [0:width] = h_final; [width:width+d_dir] interleaved
    wargs.append(_pad2(params.dir_w[:width], w_pad, half_pad))
    dir_enc_part = params.dir_w[width:]
    wargs.append(_pad_rows_sel(dir_enc_part, dxr, LANE, half_pad))
    wargs.append(_pad_rows_sel(dir_enc_part, dsr, s_dir_pad, half_pad))
    wargs.append(_pad_rows_sel(dir_enc_part, dcr, s_dir_pad, half_pad))
    wargs.append(_pad2(params.dir_b.reshape(1, -1), 1, half_pad))

    wargs.append(_pad2(params.feat_w, half_pad, c_pad))
    wargs.append(_pad2(params.feat_b.reshape(1, -1), 1, c_pad))

    if compute_dtype != jnp.float32:
        # pre-cast weight MATRICES once at trace time (not per grid step);
        # biases + sigma_w stay fp32 (fp32 accumulate / sigma path)
        sigma_w_idx = len(wargs) - 10
        wargs = [
            w if (w.shape[0] == 1 or i == sigma_w_idx)
            else w.astype(compute_dtype)
            for i, w in enumerate(wargs)
        ]

    kernel = _make_kernel(
        len(params.trunk_w), skips, c_out, compute_dtype,
        s_xyz_pad, s_dir_pad,
    )

    grid = (n_pad // tile,)
    point_spec = pl.BlockSpec(
        (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        point_spec, point_spec,
        const(e_xyz.shape), const(e_dir.shape),
    ] + [const(w.shape) for w in wargs]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(xyz_p, dirs_p, e_xyz, e_dir, *wargs)
    return out[:n, : c_out + 1]


# ------------------------------------------------- training (custom VJP)
def _make_bwd_kernel(n_layers: int, skips: Tuple[int, ...], c_out: int,
                     compute_dtype):
    """Backward pass: recompute forward in VMEM, backprop, and accumulate
    WEIGHT gradients across the (sequential) grid directly in the output
    blocks (constant index_map keeps them VMEM-resident; initialized at
    grid step 0). xyz/dirs carry no cotangent — in CR-NeRF training the
    only trainable inputs are the weights (rays and z samples come from
    data + RNG)."""

    def kernel(xyz_ref, dir_ref, exyz_ref, edir_ref, g_ref, *refs):
        n_w = (3 + 1) + sum(
            (4 + 1) if i in skips else (1 + 1)
            for i in range(1, n_layers)
        ) + 2 + 2 + 5 + 2
        w_refs = refs[:n_w]
        d_refs = refs[n_w:]
        assert len(d_refs) == n_w, (len(d_refs), n_w)

        step = pl.program_id(0)
        last = pl.num_programs(0) - 1

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
            """a^T @ dz -> (in, out) fp32 (contract the point axis)."""
            return jax.lax.dot_general(
                a.astype(dt), dz.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        # ---- forward recompute, stashing activations
        xpad = xyz_ref[:, :]
        args = jnp.dot(xpad, exyz_ref[:, :], preferred_element_type=f32)
        sins, coss = jnp.sin(args), jnp.cos(args)
        dpad = dir_ref[:, :]
        dargs = jnp.dot(dpad, edir_ref[:, :], preferred_element_type=f32)
        dsin, dcos = jnp.sin(dargs), jnp.cos(dargs)

        weights = []  # (kind, ws, dws, inputs) records for backprop
        acts = []

        w_x = nxt(); w_s = nxt(); w_c = nxt(); b0 = nxt()
        z = (mm(xpad, w_x[0][:]) + mm(sins, w_s[0][:])
             + mm(coss, w_c[0][:]) + b0[0][:])
        h = jnp.maximum(z, 0.0).astype(dt)
        weights.append(("enc", (w_x, w_s, w_c, b0), None))
        acts.append(h)

        for i in range(1, n_layers):
            if i in skips:
                ww_x = nxt(); ww_s = nxt(); ww_c = nxt(); ww_h = nxt()
                bb = nxt()
                z = (mm(xpad, ww_x[0][:]) + mm(sins, ww_s[0][:])
                     + mm(coss, ww_c[0][:]) + mm(h, ww_h[0][:])
                     + bb[0][:])
                weights.append(("skip", (ww_x, ww_s, ww_c, ww_h, bb), h))
            else:
                ww = nxt(); bb = nxt()
                z = mm(h, ww[0][:]) + bb[0][:]
                weights.append(("dense", (ww, bb), h))
            h = jnp.maximum(z, 0.0).astype(dt)
            acts.append(h)

        sw = nxt(); sb = nxt()
        z_sig = jnp.dot(h.astype(f32), sw[0][:].astype(f32),
                        preferred_element_type=f32) + sb[0][:]
        fw = nxt(); fb = nxt()
        hf = (mm(h, fw[0][:]) + fb[0][:]).astype(dt)

        wd_h = nxt(); wd_x = nxt(); wd_s = nxt(); wd_c = nxt(); bd = nxt()
        zd = (mm(hf, wd_h[0][:]) + mm(dpad, wd_x[0][:])
              + mm(dsin, wd_s[0][:]) + mm(dcos, wd_c[0][:]) + bd[0][:])
        dd = jnp.maximum(zd, 0.0).astype(dt)

        fw2 = nxt(); fb2 = nxt()
        z_feat = mm(dd, fw2[0][:]) + fb2[0][:]
        feat = jax.nn.sigmoid(z_feat)

        # ---- backward
        g = g_ref[:, :]                                  # (T, c_pad)
        t = g.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        dfeat = jnp.where(col < c_out, g, 0.0)
        dsig_col = jnp.where(col == c_out, g, 0.0)
        dsigma = jnp.sum(dsig_col, axis=1, keepdims=True)  # (T, 1)

        dz_feat = dfeat * feat * (1.0 - feat)
        fw2[1][:, :] += mm_t(dd, dz_feat)
        fb2[1][:, :] += jnp.sum(dz_feat, axis=0, keepdims=True)
        ddd = mm(dz_feat, fw2[0][:].T)
        ddd = jnp.where(dd > 0, ddd, 0.0)

        wd_h[1][:, :] += mm_t(hf, ddd)
        wd_x[1][:, :] += mm_t(dpad, ddd)
        wd_s[1][:, :] += mm_t(dsin, ddd)
        wd_c[1][:, :] += mm_t(dcos, ddd)
        bd[1][:, :] += jnp.sum(ddd, axis=0, keepdims=True)
        dhf = mm(ddd, wd_h[0][:].T)

        fw[1][:, :] += mm_t(acts[-1], dhf)
        fb[1][:, :] += jnp.sum(dhf, axis=0, keepdims=True)
        dh = mm(dhf, fw[0][:].T)

        # sigma branch: softplus' = sigmoid; dsigma broadcast to lane 0 of
        # the padded sigma block
        dz_sig = (dsigma * jax.nn.sigmoid(z_sig[:, :1]))  # (T, 1)
        sig_col = jax.lax.broadcasted_iota(jnp.int32, z_sig.shape, 1)
        dz_sig_b = jnp.where(
            sig_col == 0, jnp.broadcast_to(dz_sig, z_sig.shape), 0.0
        )
        sw[1][:, :] += mm_t(acts[-1].astype(f32), dz_sig_b)
        sb[1][:, :] += jnp.sum(dz_sig_b, axis=0, keepdims=True)
        dh = dh + jnp.dot(dz_sig_b, sw[0][:].astype(f32).T,
                          preferred_element_type=f32)

        for i in range(n_layers - 1, -1, -1):
            dz = jnp.where(acts[i] > 0, dh, 0.0)
            kind, ws, prev = weights[i]
            if kind == "enc":
                w_x, w_s, w_c, b0 = ws
                w_x[1][:, :] += mm_t(xpad, dz)
                w_s[1][:, :] += mm_t(sins, dz)
                w_c[1][:, :] += mm_t(coss, dz)
                b0[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = None  # no input grads needed
            elif kind == "skip":
                ww_x, ww_s, ww_c, ww_h, bb = ws
                ww_x[1][:, :] += mm_t(xpad, dz)
                ww_s[1][:, :] += mm_t(sins, dz)
                ww_c[1][:, :] += mm_t(coss, dz)
                ww_h[1][:, :] += mm_t(prev, dz)
                bb[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm(dz, ww_h[0][:].T)
            else:
                ww, bb = ws
                ww[1][:, :] += mm_t(prev, dz)
                bb[1][:, :] += jnp.sum(dz, axis=0, keepdims=True)
                dh = mm(dz, ww[0][:].T)

    return kernel


def _prep_wargs(params: MlpParams, n_emb_xyz: int, n_emb_dir: int,
                skips: Tuple[int, ...], compute_dtype):
    """Shared grouped-layout weight preparation (same order the kernels
    consume)."""
    d_xyz = 3 * (1 + 2 * n_emb_xyz)
    width = params.final_w.shape[0]
    w_pad = _round_up(width, LANE)
    half = params.dir_w.shape[1]
    half_pad = _round_up(half, LANE)
    c_out = params.feat_w.shape[1]
    c_pad = _round_up(c_out + 1, LANE)
    s_xyz_pad = _round_up(3 * n_emb_xyz, LANE)
    s_dir_pad = _round_up(3 * n_emb_dir, LANE)
    xr, sr, cr = _group_rows(n_emb_xyz)
    dxr, dsr, dcr = _group_rows(n_emb_dir)

    wargs = []
    wargs.append(_pad_rows_sel(params.trunk_w[0], xr, LANE, w_pad))
    wargs.append(_pad_rows_sel(params.trunk_w[0], sr, s_xyz_pad, w_pad))
    wargs.append(_pad_rows_sel(params.trunk_w[0], cr, s_xyz_pad, w_pad))
    wargs.append(_pad2(params.trunk_b[0].reshape(1, -1), 1, w_pad))
    for i in range(1, len(params.trunk_w)):
        w = params.trunk_w[i]
        if i in skips:
            wargs.append(_pad_rows_sel(w[:d_xyz], xr, LANE, w_pad))
            wargs.append(_pad_rows_sel(w[:d_xyz], sr, s_xyz_pad, w_pad))
            wargs.append(_pad_rows_sel(w[:d_xyz], cr, s_xyz_pad, w_pad))
            wargs.append(_pad2(w[d_xyz:], w_pad, w_pad))
        else:
            wargs.append(_pad2(w, w_pad, w_pad))
        wargs.append(_pad2(params.trunk_b[i].reshape(1, -1), 1, w_pad))
    wargs.append(_pad2(params.sigma_w, w_pad, LANE))
    wargs.append(_pad2(params.sigma_b.reshape(1, -1), 1, LANE))
    wargs.append(_pad2(params.final_w, w_pad, w_pad))
    wargs.append(_pad2(params.final_b.reshape(1, -1), 1, w_pad))
    wargs.append(_pad2(params.dir_w[: width], w_pad, half_pad))
    dir_enc = params.dir_w[width:]
    wargs.append(_pad_rows_sel(dir_enc, dxr, LANE, half_pad))
    wargs.append(_pad_rows_sel(dir_enc, dsr, s_dir_pad, half_pad))
    wargs.append(_pad_rows_sel(dir_enc, dcr, s_dir_pad, half_pad))
    wargs.append(_pad2(params.dir_b.reshape(1, -1), 1, half_pad))
    wargs.append(_pad2(params.feat_w, half_pad, c_pad))
    wargs.append(_pad2(params.feat_b.reshape(1, -1), 1, c_pad))
    return wargs


def _ungroup_grads(dwargs, params: MlpParams, n_emb_xyz: int,
                   n_emb_dir: int, skips: Tuple[int, ...]) -> MlpParams:
    """Grouped/padded weight grads -> MlpParams-shaped cotangent."""
    d_xyz = 3 * (1 + 2 * n_emb_xyz)
    d_dir = 3 * (1 + 2 * n_emb_dir)
    width = params.final_w.shape[0]
    half = params.dir_w.shape[1]
    c_out = params.feat_w.shape[1]
    xr, sr, cr = _group_rows(n_emb_xyz)
    dxr, dsr, dcr = _group_rows(n_emb_dir)
    it = iter(dwargs)

    def scatter_rows(gx, gs, gc, n_rows, cols, rows_x, rows_s, rows_c):
        out = jnp.zeros((n_rows, cols), jnp.float32)
        out = out.at[np.asarray(rows_x)].set(gx[: len(rows_x), :cols])
        out = out.at[np.asarray(rows_s)].set(gs[: len(rows_s), :cols])
        out = out.at[np.asarray(rows_c)].set(gc[: len(rows_c), :cols])
        return out

    tw, tb = [], []
    gx, gs, gc, gb = next(it), next(it), next(it), next(it)
    tw.append(scatter_rows(gx, gs, gc, d_xyz, width, xr, sr, cr))
    tb.append(gb[0, :width])
    for i in range(1, len(params.trunk_w)):
        if i in skips:
            gx, gs, gc, gh, gb = (next(it), next(it), next(it), next(it),
                                  next(it))
            top = scatter_rows(gx, gs, gc, d_xyz, width, xr, sr, cr)
            tw.append(jnp.concatenate([top, gh[:width, :width]], axis=0))
        else:
            gw, gb = next(it), next(it)
            tw.append(gw[:width, :width])
        tb.append(gb[0, :width])
    gsw, gsb = next(it), next(it)
    gfw, gfb = next(it), next(it)
    gdh, gdx, gds, gdc, gdb = (next(it), next(it), next(it), next(it),
                               next(it))
    gf2w, gf2b = next(it), next(it)
    dir_top = gdh[:width, :half]
    dir_enc = scatter_rows(gdx, gds, gdc, d_dir, half, dxr, dsr, dcr)
    return MlpParams(
        trunk_w=tuple(tw),
        trunk_b=tuple(tb),
        sigma_w=gsw[:width, :1],
        sigma_b=gsb[0, :1],
        final_w=gfw[:width, :width],
        final_b=gfb[0, :width],
        dir_w=jnp.concatenate([dir_top, dir_enc], axis=0),
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
):
    """Build a differentiable fused-MLP apply: forward = the v2 Pallas
    kernel; backward = a second Pallas kernel producing WEIGHT gradients
    only (rays/samples carry no trainable inputs). Activations never touch
    HBM in either pass."""

    fwd_kw = dict(n_emb_xyz=n_emb_xyz, n_emb_dir=n_emb_dir, tile=tile,
                  compute_dtype=compute_dtype, skips=skips,
                  interpret=interpret)

    @jax.custom_vjp
    def apply_fn(params: MlpParams, xyz, dirs):
        return fused_mlp_apply(params, xyz, dirs, **fwd_kw)

    def fwd(params, xyz, dirs):
        return apply_fn(params, xyz, dirs), (params, xyz, dirs)

    def bwd(res, g):
        params, xyz, dirs = res
        n = xyz.shape[0]
        c_out = params.feat_w.shape[1]
        c_pad = _round_up(c_out + 1, LANE)
        n_pad = _round_up(max(n, tile), tile)

        xyz_p = jnp.pad(
            xyz.astype(jnp.float32), ((0, n_pad - n), (0, LANE - 3))
        )
        dirs_p = jnp.pad(
            dirs.astype(jnp.float32), ((0, n_pad - n), (0, LANE - 3))
        )
        g_p = jnp.zeros((n_pad, c_pad), jnp.float32)
        g_p = g_p.at[:n, : c_out + 1].set(g.astype(jnp.float32))

        e_xyz = _pad2(jnp.asarray(_freq_matrix(n_emb_xyz)), LANE,
                      _round_up(3 * n_emb_xyz, LANE))
        e_dir = _pad2(jnp.asarray(_freq_matrix(n_emb_dir)), LANE,
                      _round_up(3 * n_emb_dir, LANE))
        wargs = _prep_wargs(params, n_emb_xyz, n_emb_dir, skips,
                            compute_dtype)
        if compute_dtype != jnp.float32:
            sigma_w_idx = len(wargs) - 10
            wargs = [
                w if (w.shape[0] == 1 or i == sigma_w_idx)
                else w.astype(compute_dtype)
                for i, w in enumerate(wargs)
            ]

        kernel = _make_bwd_kernel(
            len(params.trunk_w), skips, c_out, compute_dtype
        )
        grid = (n_pad // tile,)
        point_spec = pl.BlockSpec(
            (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [
            point_spec, point_spec, const(e_xyz.shape), const(e_dir.shape),
            pl.BlockSpec((tile, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [const(w.shape) for w in wargs]
        out_specs = [const(w.shape) for w in wargs]
        out_shapes = [
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wargs
        ]
        dwargs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(xyz_p, dirs_p, e_xyz, e_dir, g_p, *wargs)
        dparams = _ungroup_grads(dwargs, params, n_emb_xyz, n_emb_dir,
                                 skips)
        return dparams, jnp.zeros_like(xyz), jnp.zeros_like(dirs)

    apply_fn.defvjp(fwd, bwd)
    return apply_fn
