#!/usr/bin/env python
"""Spike: software-pipelined fused-render FORWARD kernel.

Hypothesis: the fwd kernels sit at ~65-75% of the MXU bound because the
in-kernel positional encode (VPU sin/cos + ladder) serializes against the
trunk matmuls (MXU) within each grid step — TPU is VLIW, so INDEPENDENT
VPU and MXU work can co-issue, but the current body gives the scheduler a
strict enc -> trunk -> composite chain per tile.

Variant: each grid step carries P half-tiles; the body encodes every half
first (separate scratch buffers), then runs the trunk per half, then
composites per half. Half k's encode is independent of half j's trunk, so
Mosaic's scheduler may interleave them.

    python scripts/spike_interleave.py --rays 8192 --s 128 --k 8
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crnerf_tpu.ops.fused_mlp import LANE, _round_up
from crnerf_tpu.ops.fused_render import (
    _build_enc_t,
    _composite_fwd_math,
    _make_render_fwd_kernel,
    _mlp_fwd,
    _ray_masks,
    _stage_inputs,
    enc_t_rows,
    fused_render_apply,
)
from scripts.spike_stash_bench import make_params


def _make_pipe_fwd_kernel(n_layers, skips, c_out, compute_dtype, r_half,
                          s, n_emb_xyz, phases, exact_encode):
    def kernel(in0_ref, z_ref, noise_ref, dir_ref, *refs):
        out_ray_ref, w_ref = refs[-2 - phases], refs[-1 - phases]
        w_refs = refs[:-2 - phases]
        scratches = refs[-phases:]

        a, b = _ray_masks(r_half, s, jnp.float32)
        dt = compute_dtype
        rows = lambda i: pl.dslice(i * r_half, r_half)  # noqa: E731

        # ---- phase 1: encode every half (VPU + small MXU)
        encs = []
        for i in range(phases):
            encs.append(
                _build_enc_t(in0_ref[rows(i), :], z_ref[rows(i), :],
                             a, b, n_emb_xyz, scratches[i],
                             exact=exact_encode)
            )

        # ---- phase 2: trunk per half (MXU) — half i's matmuls are
        # independent of half j's encode, giving the scheduler slack
        outs = []
        for i in range(phases):
            enc_t = encs[i]
            e_rows = enc_t.shape[0]
            dir_l = dir_ref[rows(i), :]

            def enc_mm(w_ref_, enc_t=enc_t, e_rows=e_rows):
                return jax.lax.dot_general(
                    enc_t.astype(dt), w_ref_[0:e_rows, :].astype(dt),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def dir_term(wd_e_ref, dir_l=dir_l):
                contrib = jnp.dot(
                    dir_l.astype(dt), wd_e_ref[:].astype(dt),
                    preferred_element_type=jnp.float32,
                )
                return jax.lax.dot_general(
                    a, contrib,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            widx = 0

            def nxt():
                nonlocal widx
                r = w_refs[widx]
                widx += 1
                return r

            _, _, z_sig, _, _, feat = _mlp_fwd(
                enc_mm, nxt, n_layers, skips, dt, keep_acts=False,
                dir_term=dir_term,
            )
            outs.append((z_sig, feat))

        # ---- phase 3: composite per half (VPU)
        for i in range(phases):
            z_sig, feat = outs[i]
            sigma = jax.nn.softplus(z_sig[:, :1])
            z = z_ref[rows(i), :]
            noise = noise_ref[rows(i), :]
            _, _, _, _, _, weights, w_big = _composite_fwd_math(
                sigma, z, noise, a, b, s
            )
            fmap = jnp.dot(w_big, feat,
                           preferred_element_type=jnp.float32)
            depth = jnp.sum(weights * z, axis=-1, keepdims=True)
            col = jax.lax.broadcasted_iota(jnp.int32, fmap.shape, 1)
            depth_b = jnp.broadcast_to(depth, fmap.shape)
            out_ray_ref[rows(i), :] = jnp.where(
                col < c_out, fmap,
                jnp.where(col == c_out, depth_b, 0.0),
            )
            w_ref[rows(i), :] = weights

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_emb_xyz", "n_emb_dir", "phases", "compute_dtype",
                     "skips", "exact_encode", "r_half"),
)
def pipe_render_apply(params, pos, dirs, z_vals, noise, n_emb_xyz=15,
                      n_emb_dir=4, phases=2, r_half=8,
                      compute_dtype=jnp.bfloat16, skips=(4,),
                      exact_encode=False):
    n, s = z_vals.shape
    r_tile = r_half * phases
    t_half = r_half * s
    n_pad = _round_up(max(n, r_tile), r_tile)
    c_out = params.feat_w.shape[1]
    c_pad = _round_up(c_out + 1, LANE)

    in0, z_p, no_p, dir_blk, wargs = _stage_inputs(
        params, pos, dirs, z_vals, noise, n, s, n_pad, n_emb_xyz,
        n_emb_dir, compute_dtype, exact_encode, True, skips,
    )
    kernel = _make_pipe_fwd_kernel(
        len(params.trunk_w), skips, c_out, compute_dtype, r_half, s,
        n_emb_xyz, phases, exact_encode,
    )
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_ray, weights = pl.pallas_call(
        kernel,
        grid=(n_pad // r_tile,),
        in_specs=[
            pl.BlockSpec((r_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
            pltpu.VMEM((enc_t_rows(n_emb_xyz), t_half), jnp.float32)
            for _ in range(phases)
        ],
    )(in0, z_p, no_p, dir_blk, *wargs)
    return out_ray[:n], weights[:n]


def bench_fwd(fn, p, o, d, z, noise, k):
    def one(carry, _):
        acc, oo = carry
        rb, w = fn(p, oo, d, z, noise)
        # chain: next origins depend on this result (forces execution)
        oo2 = oo + 1e-18 * rb[:, :1]
        return (acc + jnp.sum(rb[:, :65]) * 1e-6, oo2), None

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(o0, steps):
        (acc, of), _ = jax.lax.scan(one, (0.0, o0), None, length=steps)
        return acc + jnp.sum(of) * 0.0

    for steps in (k, 2 * k):
        run(o, steps=steps).block_until_ready()

    def timed(steps):
        t0 = time.perf_counter()
        float(run(o, steps=steps))
        return time.perf_counter() - t0

    t_k = min(timed(k) for _ in range(3))
    t_2k = min(timed(2 * k) for _ in range(3))
    return (t_2k - t_k) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    p = make_params(key)
    n, s = args.rays, args.s
    o = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    z = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(2), (n, s)) * 3 + 0.5, -1
    )
    noise = jnp.zeros((n, s))
    pts = n * s

    base_kw = dict(n_emb_xyz=15, n_emb_dir=4,
                   compute_dtype=jnp.bfloat16, skips=(4,),
                   exact_encode=False, rays_in=True)

    def base(r_tile):
        return lambda pp, oo, dd, zz, nn: fused_render_apply(
            pp, oo, dd, zz, nn, r_tile=r_tile, **base_kw
        )

    variants = [
        ("baseline r_tile=8", base(8)),
        ("baseline r_tile=32", base(32)),
        ("baseline r_tile=64", base(64)),
    ]
    for phases, r_half in ((2, 16), (2, 32), (4, 16)):
        variants.append((
            f"pipelined {phases}x{r_half}",
            lambda pp, oo, dd, zz, nn, ph=phases, rh=r_half:
            pipe_render_apply(
                pp, oo, dd, zz, nn, phases=ph, r_half=rh,
                compute_dtype=jnp.bfloat16, exact_encode=False,
            ),
        ))

    # correctness cross-check first; drop variants that exceed VMEM
    ref_rb, ref_w = variants[0][1](p, o, d, z, noise)
    ok = [variants[0]]
    for name, fn in variants[1:]:
        try:
            rb, w = fn(p, o, d, z, noise)
        except Exception as e:  # noqa: BLE001 — VMEM OOM etc.
            print(f"{name}: SKIP ({str(e)[:80]})")
            continue
        err = float(jnp.max(jnp.abs(rb[:, :65] - ref_rb[:, :65])))
        werr = float(jnp.max(jnp.abs(w - ref_w)))
        print(f"{name}: max|d_out| {err:.2e}  max|d_w| {werr:.2e}")
        ok.append((name, fn))

    for name, fn in ok:
        dt = bench_fwd(fn, p, o, d, z, noise, args.k)
        print(f"{name:22s}: {dt * 1e3:7.2f} ms fwd "
              f"({pts / dt / 1e6:7.1f} Mpts/s) at ({n} x {s})")


if __name__ == "__main__":
    main()
