#!/usr/bin/env python
"""Feasibility spike: multiresolution HASH-GRID encoding on TPU.

BASELINE.json north-star config 5 names "Pallas hash-grid encoding" as
the one idea that could move the 178k rays/s practical ceiling — it
changes the architecture term the ceiling is conditioned on (replace
the 8x256 frequency-posenc MLP, whose fwd+bwd kernels are 77.8 ms of
the 98.9 ms step, with an instant-NGP-style hash table + tiny MLP).

This spike measures the TPU cost of the part that decides feasibility:
the hash-table GATHER (forward) and SCATTER-ADD (table gradient) at
step shapes, plus a 2x64 MLP, fwd+bwd end to end. TPU has no efficient
in-kernel (Mosaic) random gather, so the encode is expressed in XLA
(`jnp.take` lowers to the TPU gather HLO; its VJP is scatter-add) —
i.e. this is an XLA-first design probe, and "Pallas hash-grid" would
only matter if XLA's gather/scatter emitters prove to be the
bottleneck. Marginal-scan timing (BASELINE.md methodology): k and 2k
chained steps inside one jit, scalar fetch, difference cancels
dispatch overhead.

Shapes: L=16 levels x T=2^16 entries x F=2 features (the instant-NGP
defaults), base res 16, growth b=1.382; P points per call. The bench
step renders 16,384 rays x (64 coarse + 128 fine) = 3.15M points.

    python scripts/spike_hashgrid.py --pts 1048576 --k 8
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

PRIMES = (1, 2654435761, 805459861)  # instant-NGP spatial hash primes


def make_tables(key, levels, t_log2, feat):
    # F-MAJOR layout (feat, levels*2^t_log2): the gather then runs along
    # axis=1 so its output (F, P, L*8) has a 128-wide lane minor — the
    # row-major (P, L*8, F=2) form tile-pads 64x and OOMs HBM at 1M pts
    # (the repo's thin-lane rule, CLAUDE.md / BASELINE.md).
    return (jax.random.normal(key, (feat, levels << t_log2),
                              jnp.float32) * 1e-2)


def hash_encode(table_fm, pts, levels, t_log2, feat, n_min=16.0, b=1.382,
                chunk=131072):
    """pts (P,3) in [0,1] -> (P, levels*feat). One fused gather for all
    levels x 8 corners per chunk; the 8-corner trilinear reduction is a
    (L*8, L) 0/1 matmul (MXU) instead of a thin-minor reshape+sum."""
    mask = (1 << t_log2) - 1
    # S[c, l] = 1 where corner-column c belongs to level l
    sel = jnp.eye(levels, dtype=jnp.float32).repeat(8, axis=0)  # (L*8, L)

    def encode_chunk(p):
        idx_all, w_all = [], []
        for lv in range(levels):
            res = n_min * (b ** lv)
            x = p * res
            x0 = jnp.floor(x)
            fx = x - x0
            x0 = x0.astype(jnp.int32)
            for c in range(8):
                off = jnp.array(
                    [(c >> 2) & 1, (c >> 1) & 1, c & 1], jnp.int32
                )
                corner = (x0 + off).astype(jnp.uint32)
                h = (corner[:, 0] * jnp.uint32(PRIMES[0])
                     ^ corner[:, 1] * jnp.uint32(PRIMES[1])
                     ^ corner[:, 2] * jnp.uint32(PRIMES[2])
                     ) & jnp.uint32(mask)
                idx_all.append(h.astype(jnp.int32) + (lv << t_log2))
                wx = jnp.where(off[0] == 1, fx[:, 0], 1.0 - fx[:, 0])
                wy = jnp.where(off[1] == 1, fx[:, 1], 1.0 - fx[:, 1])
                wz = jnp.where(off[2] == 1, fx[:, 2], 1.0 - fx[:, 2])
                w_all.append(wx * wy * wz)
        idx = jnp.stack(idx_all, axis=1)          # (Pc, L*8)
        w = jnp.stack(w_all, axis=1)              # (Pc, L*8)
        v = jnp.take(table_fm, idx, axis=1)       # (F, Pc, L*8) gather
        vw = v * w[None].astype(v.dtype)
        out = jnp.einsum("fpc,cl->fpl", vw.astype(jnp.float32), sel)
        return out.transpose(1, 2, 0).reshape(p.shape[0], levels * feat)

    n = pts.shape[0]
    if n <= chunk:
        return encode_chunk(pts)
    assert n % chunk == 0, (n, chunk)
    out = jax.lax.map(encode_chunk, pts.reshape(n // chunk, chunk, 3))
    return out.reshape(n, levels * feat)


def tiny_mlp(params, x):
    h = x
    for wgt, b in params[:-1]:
        h = jax.nn.relu(h @ wgt + b)
    wgt, b = params[-1]
    return h @ wgt + b                           # (P, 1+64): sigma+feat


def make_mlp(key, d_in, width=64, depth=2, d_out=65):
    ks = jax.random.split(key, depth + 1)
    dims = [d_in] + [width] * depth + [d_out]
    return [
        (jax.random.normal(ks[i], (dims[i], dims[i + 1])) *
         (1.0 / jnp.sqrt(dims[i])), jnp.zeros((dims[i + 1],)))
        for i in range(depth + 1)
    ]


def bench(run, params, k):
    for steps in (k, 2 * k):
        run(params, steps=steps).block_until_ready()

    def timed(steps):
        t0 = time.perf_counter()
        float(run(params, steps=steps))
        return time.perf_counter() - t0

    reps = [(timed(2 * k) - timed(k)) / k for _ in range(3)]
    return sorted(reps)[1]  # median seconds/step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=1 << 20)
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--t_log2", type=int, default=16)
    ap.add_argument("--feat", type=int, default=2)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--bf16_table", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (args.pts, 3))
    table = make_tables(key, args.levels, args.t_log2, args.feat)
    if args.bf16_table:
        table = table.astype(jnp.bfloat16)
    mlp = make_mlp(key, args.levels * args.feat)

    enc = functools.partial(hash_encode, levels=args.levels,
                            t_log2=args.t_log2, feat=args.feat)

    def loss_full(p):
        tab, mp = p
        f = enc(tab, pts)  # gathers in the table's dtype (bf16 or f32)
        out = tiny_mlp(mp, f)
        return jnp.sum(out * 1e-6)

    def loss_enc(p):
        (tab,) = p
        return jnp.sum(enc(tab, pts) * 1e-6)

    def make_run(loss, fwd_only=False):
        def one(carry, _):
            p, acc = carry
            if fwd_only:
                # tie the iteration's input to the carry so XLA cannot
                # hoist the loop-invariant encode out of the scan
                p_step = jax.tree.map(
                    lambda a: a + jnp.asarray(acc * 0, a.dtype), p
                )
                v = loss(p_step)
                return (p, acc + v), None
            v, g = jax.value_and_grad(loss)(p)
            p2 = jax.tree.map(lambda a, b: a + 1e-12 * b.astype(a.dtype),
                              p, g)
            return (p2, acc + v), None

        @functools.partial(jax.jit, static_argnames=("steps",))
        def run(p0, steps):
            (pf, acc), _ = jax.lax.scan(one, (p0, 0.0), None, length=steps)
            return acc + jax.tree.leaves(pf)[0].astype(jnp.float32).sum() * 0.0

        return run

    dev = jax.devices()[0].platform
    print(f"platform={dev} pts={args.pts} L={args.levels} "
          f"T=2^{args.t_log2} F={args.feat} "
          f"table={'bf16' if args.bf16_table else 'f32'}", flush=True)

    s_fwd = bench(make_run(loss_enc, fwd_only=True), (table,), args.k)
    print(f"hash encode FWD only (pure gather): "
          f"{s_fwd * 1e3:.2f} ms / {args.pts} pts", flush=True)

    s_enc = bench(make_run(loss_enc), (table,), args.k)
    print(f"hash encode fwd+bwd (gather + scatter-add VJP): "
          f"{s_enc * 1e3:.2f} ms / {args.pts} pts", flush=True)

    s_full = bench(make_run(loss_full), (table, mlp), args.k)
    print(f"hash encode + 2x64 MLP fwd+bwd: {s_full * 1e3:.2f} ms",
          flush=True)

    # projection: bench step = 16,384 rays x 192 pts = 3.146M pts; the
    # 8x256 MLP+posenc kernels it replaces cost 77.8 ms; conv heads +
    # tail (~20 ms) are architecture-independent and stay.
    step_pts = 16384 * 192
    hash_ms = s_full * 1e3 * step_pts / args.pts
    proj = 16384 / ((hash_ms + 21.0) * 1e-3)
    print(f"projected: {hash_ms:.1f} ms hash+MLP per 3.15M-pt step "
          f"(replaces 77.8 ms) + ~21 ms heads/tail -> "
          f"~{proj / 1e3:.0f}k rays/s IF quality holds", flush=True)


if __name__ == "__main__":
    main()
