"""Spike: Pallas kernel for the PACKED (space-to-depth) 2x2 conv vs XLA.

Context (BASELINE.md 2026-08-19): the conv heads are the last multi-ms
target (~15-16 ms of the 99 ms step). Six schedules failed; the
whole-stack s2d measured NEUTRAL — XLA executes the packed 2x2 conv
(256/512-wide contractions) no faster than its 3x3 emitters (~24% MXU).
A 64-ch Pallas halo conv lost 3-10x because 64-wide operands cap the
128x128 MXU at 25% — but the PACKED form's 256/512-wide operands fill
it. This spike measures a row-tiled Pallas packed-conv forward against
XLA's packed and 3x3 convs at the encoder's two level shapes. Decision
rule: >= 1.5x over XLA -> invest in the fused level kernel + custom VJP;
else record and stop.

Row tiling: output rows come in rt-row tiles; the 2x2 kernel needs one
halo row below, which standard (non-overlapping) BlockSpec indexing
cannot express — so the input arrives as TWO refs: the rt-row main
block and a 1-row halo block at row (ni*rt + rt), concatenated
in-kernel.

Usage: python scripts/spike_packed_conv.py [--iters 50] [--rt 8]
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


def packed_conv_kernel(xm_ref, xh_ref, k_ref, o_ref, *, rt, w, c4, f4):
    """One (rt, w, 4F) output row-tile: 4 shifted (rt*w, 4C)@(4C, 4F)
    matmuls over the haloed (rt+1, w+1, 4C) input window."""
    win = jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0)  # (rt+1, w+1, c4)
    acc = jnp.zeros((rt * w, f4), jnp.float32)
    for r in range(2):
        for s in range(2):
            xb = win[r:r + rt, s:s + w, :].reshape(rt * w, c4)
            acc += jnp.dot(xb, k_ref[r, s],
                           preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(1, rt, w, f4).astype(o_ref.dtype)


def pallas_packed_conv(xp_pad, k2, rt):
    """xp_pad: (B, I+1, J+1, 4C) pre-padded packed input; k2 (2,2,4C,4F).
    Grid over (B, I/rt) output row-tiles."""
    b, ip1, jp1, c4 = xp_pad.shape
    i, j = ip1 - 1, jp1 - 1
    f4 = k2.shape[-1]
    assert i % rt == 0, (i, rt)
    kern = functools.partial(packed_conv_kernel, rt=rt, w=j, c4=c4, f4=f4)
    return pl.pallas_call(
        kern,
        grid=(b, i // rt),
        in_specs=[
            pl.BlockSpec((1, rt, jp1, c4), lambda nb, ni: (nb, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, jp1, c4),
                         lambda nb, ni: (nb, ni * rt + rt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, c4, f4), lambda nb, ni: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, j, f4),
                               lambda nb, ni: (nb, ni, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, i, j, f4), xp_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(xp_pad, xp_pad, k2)


def marginal(fn, x, k, iters):
    """Marginal-scan timing (BASELINE.md methodology): steps are CHAINED
    by threading each step's output sum back into the kernel (so XLA can
    neither hoist the conv out of the scan nor narrow it to the fetched
    scalar); scalar-fetch K and 2K loops, report the difference / K."""
    import functools

    def body(carry, _):
        kk, acc = carry
        out = fn(x, kk)
        s = jnp.sum(out.astype(jnp.float32)) * 1e-9
        return (kk + (s * 1e-30).astype(kk.dtype), acc + s), None

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(k0, steps):
        (kf, acc), _ = jax.lax.scan(body, (k0, 0.0), None, length=steps)
        return acc

    for steps in (iters, 2 * iters):
        float(run(k, steps=steps))  # compile both lengths

    def timed(steps):
        t0 = time.perf_counter()
        float(run(k, steps=steps))
        return time.perf_counter() - t0

    t1 = min(timed(iters) for _ in range(3))
    t2 = min(timed(2 * iters) for _ in range(3))
    return (t2 - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rt", type=int, default=8)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    # (label, original (B, H, W, C), F) — conv3/conv5 encoder shapes
    cases = [
        ("conv3 L1 160x224x64->64", (8, 160, 224, 64), 64),
        ("conv5 L2 80x112x128->128", (8, 80, 112, 128), 128),
    ]
    for label, (b, h, w0, c), f in cases:
        x = jax.random.normal(key, (b, h, w0, c), jnp.bfloat16)
        k3 = jax.random.normal(key, (3, 3, c, f), jnp.bfloat16) * 0.05

        from crnerf_tpu.models.common import (
            _pack_kernel3x3, _s2d, packed_reflect_pad1, reflect_pad,
        )

        k2 = _pack_kernel3x3(k3)
        xp_pad = packed_reflect_pad1(_s2d(x))
        c4, f4 = 4 * c, 4 * f

        ref = jax.lax.conv_general_dilated(
            xp_pad, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = pallas_packed_conv(xp_pad, k2, args.rt)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        print(f"{label}: max rel err vs XLA packed = {err / scale:.2e}")

        t_pl = marginal(lambda a, k: pallas_packed_conv(a, k, args.rt),
                        xp_pad, k2, args.iters)
        t_xp = marginal(
            lambda a, k: jax.lax.conv_general_dilated(
                a, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            xp_pad, k2, args.iters)
        xpad = reflect_pad(x, 1)
        t_x3 = marginal(
            lambda a, k: jax.lax.conv_general_dilated(
                a, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            xpad, k3, args.iters)
        i, j = h // 2, w0 // 2
        gflop = b * i * j * 4 * c4 * f4 * 2 / 1e9  # packed-form FLOPs
        print(f"  pallas packed : {t_pl * 1e3:7.3f} ms "
              f"({gflop / t_pl / 1e3:6.1f} TFLOP/s)")
        print(f"  xla packed    : {t_xp * 1e3:7.3f} ms "
              f"({gflop / t_xp / 1e3:6.1f} TFLOP/s)")
        print(f"  xla 3x3       : {t_x3 * 1e3:7.3f} ms "
              f"(same math at 9/16 the packed FLOPs)")


if __name__ == "__main__":
    main()
