#!/usr/bin/env python
"""A/B the stash backward vs the recompute backward on the real chip.

Full CR-NeRF kernel config (8x256 trunk, 64-ch features, emb 15/4, bf16),
fine-pass shapes at a given ray count. Marginal-scan timing (BASELINE.md
methodology): K and 2K chained value_and_grad steps inside one jit, scalar
fetch, difference cancels dispatch/fetch overhead.

    python scripts/spike_stash_bench.py --rays 4096 --s 128 --k 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crnerf_tpu.ops.fused_mlp import MlpParams
from crnerf_tpu.ops.fused_render import make_fused_render_train


def make_params(key, depth=8, width=256, c_out=64, n_emb_xyz=15,
                n_emb_dir=4, skips=(4,)):
    ks = jax.random.split(key, 40)
    in_xyz = 6 * n_emb_xyz + 3
    in_dir = 6 * n_emb_dir + 3
    tw, tb = [], []
    for i in range(depth):
        cin = in_xyz if i == 0 else (
            width + in_xyz if i in skips else width
        )
        tw.append(jax.random.normal(ks[i], (cin, width)) * 0.1)
        tb.append(jnp.zeros((width,)))
    return MlpParams(
        trunk_w=tuple(tw), trunk_b=tuple(tb),
        sigma_w=jax.random.normal(ks[20], (width, 1)) * 0.1,
        sigma_b=jnp.zeros((1,)),
        final_w=jax.random.normal(ks[21], (width, width)) * 0.1,
        final_b=jnp.zeros((width,)),
        dir_w=jax.random.normal(ks[22], (width + in_dir, width // 2)) * 0.1,
        dir_b=jnp.zeros((width // 2,)),
        feat_w=jax.random.normal(ks[23], (width // 2, c_out)) * 0.1,
        feat_b=jnp.zeros((c_out,)),
    )


def bench(fn, p, o, d, z, noise, k):
    def one(carry, _):
        pp, acc = carry

        def loss(q):
            rb, w = fn(q, o, d, z, noise)
            return jnp.sum(rb[:, :65]) * 1e-6 + jnp.sum(w) * 1e-6

        v, g = jax.value_and_grad(loss)(pp)
        # thread the grad back into params so steps are truly chained
        pp2 = jax.tree.map(lambda a, b: a + 1e-12 * b, pp, g)
        return (pp2, acc + v), None

    import functools

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(p0, steps):
        (pf, acc), _ = jax.lax.scan(one, (p0, 0.0), None, length=steps)
        return acc + jax.tree.leaves(pf)[0].sum() * 0.0

    for steps in (k, 2 * k):
        run(p, steps=steps).block_until_ready()  # compile both lengths

    def timed(steps):
        t0 = time.perf_counter()
        float(run(p, steps=steps))
        return time.perf_counter() - t0

    t_k = min(timed(k) for _ in range(3))
    t_2k = min(timed(2 * k) for _ in range(3))
    return (t_2k - t_k) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
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
    kw = dict(n_emb_xyz=15, n_emb_dir=4, s=s,
              compute_dtype=jnp.bfloat16, skips=(4,),
              exact_encode=False, rays_in=True)

    base = max(8, 2048 // s)
    combos = [(base, base)] + [
        (base, rb) for rb in (base // 2, base * 2, base * 4)
    ] + [(base * 2, base), (base // 2, base)]
    for r_fwd, r_bwd in combos:
        if min(r_fwd, r_bwd) < 8:
            continue
        try:
            fn = make_fused_render_train(**kw, stash=True,
                                         r_tile=r_fwd, r_tile_bwd=r_bwd)
            dt = bench(fn, p, o, d, z, noise, args.k)
        except Exception as e:  # noqa: BLE001 — VMEM OOM etc.
            print(f"r_fwd={r_fwd} r_bwd={r_bwd}: SKIP ({str(e)[:70]})")
            continue
        pts = n * s
        print(f"r_fwd={r_fwd} r_bwd={r_bwd}: {dt * 1e3:8.2f} ms per "
              f"fwd+bwd ({pts / dt / 1e6:7.1f} Mpts/s) at ({n} x {s})")


if __name__ == "__main__":
    main()
