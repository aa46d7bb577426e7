#!/usr/bin/env python
"""Spike: 3x3 VALID conv as a Pallas halo kernel vs XLA's conv emitters
at the appearance-encoder's train shapes.

XLA's TPU conv emitters run the style encoder's 64/128-channel 3x3 convs
at ~20-30% MXU (profile, BASELINE.md). This kernel blocks over (N, H/R)
with three ROW-shifted input views (so no overlapping block reads) and
does the column taps as in-kernel sublane slices; each tile's 9 taps are
(R*W, C)@(C, Co) MXU matmuls on VMEM-resident data — input read once.

    python scripts/spike_conv3x3.py --n 8 --h 160 --w 224 --c 64 --co 64
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


def _fwd_kernel(w_out, x0_ref, x1_ref, x2_ref, k_ref, out_ref):
    f32 = jnp.float32
    acc = None
    for i, xr in enumerate((x0_ref, x1_ref, x2_ref)):
        x = xr[0]  # (R, W+2, C)
        for j in range(3):
            tap = x[:, j:j + w_out, :]
            r, w, c = tap.shape
            t = jax.lax.dot_general(
                tap.reshape(r * w, c), k_ref[i, j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            acc = t if acc is None else acc + t
    r = out_ref.shape[1]
    out_ref[0] = acc.reshape(r, w_out, -1)


@functools.partial(jax.jit, static_argnames=("r_tile", "interpret"))
def conv3x3_valid_fwd(xpad, kernel, r_tile=8, interpret=False):
    """xpad (N, H+2, W+2, C), kernel (3, 3, C, Co) -> (N, H, W, Co) f32."""
    n, hp2, wp2, c = xpad.shape
    h, w = hp2 - 2, wp2 - 2
    co = kernel.shape[-1]
    x0 = xpad[:, 0:h, :, :]
    x1 = xpad[:, 1:h + 1, :, :]
    x2 = xpad[:, 2:h + 2, :, :]
    grid = (n, h // r_tile)
    xspec = pl.BlockSpec((1, r_tile, wp2, c), lambda a, b: (a, b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, w),
        grid=grid,
        in_specs=[xspec, xspec, xspec,
                  pl.BlockSpec((3, 3, c, co), lambda a, b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r_tile, w, co),
                               lambda a, b: (a, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), jnp.float32),
        interpret=interpret,
    )(x0, x1, x2, kernel)


def _dw_kernel(w_out, x0_ref, x1_ref, x2_ref, dy_ref, dk_ref):
    f32 = jnp.float32
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)

    dy = dy_ref[0]
    r, w, co = dy.shape
    dyf = dy.reshape(r * w, co)
    for i, xr in enumerate((x0_ref, x1_ref, x2_ref)):
        x = xr[0]
        for j in range(3):
            tap = x[:, j:j + w_out, :]
            c = tap.shape[-1]
            dk_ref[i, j] += jax.lax.dot_general(
                tap.reshape(r * w_out, c), dyf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )


@functools.partial(jax.jit, static_argnames=("r_tile", "interpret"))
def conv3x3_dw(xpad, dy, r_tile=8, interpret=False):
    """-> dKernel (3, 3, C, Co) f32."""
    n, hp2, wp2, c = xpad.shape
    h, w = hp2 - 2, wp2 - 2
    co = dy.shape[-1]
    x0 = xpad[:, 0:h, :, :]
    x1 = xpad[:, 1:h + 1, :, :]
    x2 = xpad[:, 2:h + 2, :, :]
    grid = (n, h // r_tile)
    xspec = pl.BlockSpec((1, r_tile, wp2, c), lambda a, b: (a, b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dw_kernel, w),
        grid=grid,
        in_specs=[xspec, xspec, xspec,
                  pl.BlockSpec((1, r_tile, w, co),
                               lambda a, b: (a, b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, 3, c, co), lambda a, b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, c, co), jnp.float32),
        interpret=interpret,
    )(x0, x1, x2, dy)


def xla_conv(xpad, kernel):
    return jax.lax.conv_general_dilated(
        xpad, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def marginal(fn, args, k=20):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(steps):
        def body(c, _):
            o = fn(*args)
            return c + jnp.sum(o) * 1e-9, None
        acc, _ = jax.lax.scan(body, 0.0, None, length=steps)
        return acc

    for s in (k, 2 * k):
        run(steps=s).block_until_ready()

    def t(steps):
        t0 = time.perf_counter()
        float(run(steps=steps))
        return time.perf_counter() - t0

    return (min(t(2 * k) for _ in range(3)) -
            min(t(k) for _ in range(3))) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--h", type=int, default=160)
    ap.add_argument("--w", type=int, default=224)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--co", type=int, default=64)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    kx = jax.random.PRNGKey(0)
    xpad = jax.random.normal(
        kx, (args.n, args.h + 2, args.w + 2, args.c), jnp.bfloat16
    )
    kernel = jax.random.normal(
        jax.random.PRNGKey(1), (3, 3, args.c, args.co), jnp.bfloat16
    )
    dy = jax.random.normal(
        jax.random.PRNGKey(2), (args.n, args.h, args.w, args.co),
        jnp.bfloat16,
    )

    if args.check:
        a = conv3x3_valid_fwd(xpad, kernel, interpret=True)
        b = xla_conv(xpad, kernel)
        import numpy as np

        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)
        # dw check vs autodiff (f32 throughout; the kernel accumulates
        # taps in f32 from bf16 operands, so compare loosely)
        xf, df = xpad.astype(jnp.float32), dy.astype(jnp.float32)
        g = jax.grad(
            lambda kk: jnp.sum(xla_conv(xf, kk) * df)
        )(kernel.astype(jnp.float32))
        dk = conv3x3_dw(xpad, dy, interpret=True)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(g),
                                   rtol=5e-2, atol=5e-1)
        print("checks OK")
        return

    flops = 2 * 9 * args.n * args.h * args.w * args.c * args.co
    for name, fn, a in [
        ("xla fwd   ", xla_conv, (xpad, kernel)),
        ("pallas fwd", lambda x, kk: conv3x3_valid_fwd(x, kk), (xpad, kernel)),
        ("pallas dw ", lambda x, d: conv3x3_dw(x, d), (xpad, dy)),
    ]:
        dt = marginal(fn, a)
        print(f"{name}: {dt * 1e3:7.3f} ms  ({flops / dt / 1e12:6.1f} "
              f"TFLOP/s)")


if __name__ == "__main__":
    main()
